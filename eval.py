#!/usr/bin/env python
"""S-NeRF evaluation CLI: render held-out views, report PSNR/SSIM, dump
rgb png + depth npy + semantic npy.

Behavioral parity target: reference s-nerf/eval.py:32-205 (load config +
ckpt, chunked full-image renders of the test split, PSNR, depth/semantic
dumps, optional test-time pose refinement).
"""

from __future__ import annotations

import json
import os
import sys


def main(argv=None):
  import jax
  import jax.numpy as jnp
  import numpy as np

  from snerf_tpu.config import load_config
  from snerf_tpu.data.raygen import rays_for_image
  from snerf_tpu.parallel import make_mesh
  from snerf_tpu.train import checkpoints as ckpt_lib
  from snerf_tpu.train.renderer import make_eval_render_fn, render_image
  from snerf_tpu.train.trainer import create_train_state
  from snerf_tpu.utils.metrics import MetricHarness
  from train import load_scene

  cfg = load_config(argv)
  exp_dir = cfg.exp_dir()
  ckpt_dir = os.path.join(exp_dir, "checkpoints")

  scene = load_scene(cfg)
  step = None if cfg.ckpt < 0 else cfg.ckpt
  if cfg.model == "zipnerf":
    from snerf_tpu.train.zip_trainer import create_zip_train_state
    zmcfg = cfg.zip_model_config()
    ztcfg = cfg.zip_train_config()
    model, state = create_zip_train_state(jax.random.PRNGKey(0), zmcfg,
                                          ztcfg)
  else:
    mcfg = cfg.model_config()
    tcfg = cfg.train_config()
    model, pose_model, state = create_train_state(
        jax.random.PRNGKey(0), mcfg, tcfg, scene.num_images)
  state, restored = ckpt_lib.restore_checkpoint(ckpt_dir, state, step=step)
  if restored is None:
    raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
  print(f"evaluating checkpoint step {restored}")

  out_dir = os.path.join(exp_dir, f"testset_{restored:06d}")
  os.makedirs(out_dir, exist_ok=True)

  idxs = scene.i_test if cfg.eval_test else scene.i_train
  mesh = make_mesh() if len(jax.devices()) > 1 else None
  if cfg.model == "zipnerf":
    params = state.params

    @jax.jit
    def render_fn(rays):
      rend, _ = model.apply({"params": params}, rays, rng=None)
      out = {"rgb": rend[-1]["rgb"],
             "distance": rend[-1]["depth"][..., None],
             "acc": rend[-1]["acc"][..., None]}
      if rend[-1].get("semantic") is not None:
        out["semantic"] = rend[-1]["semantic"]
      return out
  else:
    render_fn = make_eval_render_fn(model, state.params,
                                    white_bkgd=cfg.white_bkgd)
  harness = MetricHarness()
  H, W = scene.hw
  results = []
  for ti in np.asarray(idxs):
    rays = rays_for_image(
        jnp.asarray(scene.poses[ti]), jnp.asarray(scene.intrinsics[ti]),
        H, W, scene.near, scene.far,
        render_factor=cfg.render_factor)
    out = render_image(render_fn, rays, chunk=cfg.chunk, mesh=mesh)
    gt = scene.images[ti].astype(np.float32) / 255.0
    if cfg.render_factor:
      import cv2
      gt = cv2.resize(gt, (out["rgb"].shape[1], out["rgb"].shape[0]))
    m = harness(jnp.asarray(out["rgb"]), jnp.asarray(gt))
    results.append({"img": int(ti), **m})
    print(f"img {ti}: psnr={m['psnr']:.2f} ssim={m['ssim']:.4f}")

    import imageio.v2 as imageio
    imageio.imwrite(os.path.join(out_dir, f"{ti:03d}.png"),
                    (np.clip(out["rgb"], 0, 1) * 255).astype(np.uint8))
    np.save(os.path.join(out_dir, f"{ti:03d}_depth.npy"),
            out["distance"][..., 0])
    if "semantic" in out:
      np.save(os.path.join(out_dir, f"{ti:03d}_semantic.npy"),
              np.argmax(out["semantic"], axis=-1).astype(np.int32))

  mean_psnr = float(np.mean([r["psnr"] for r in results]))
  mean_ssim = float(np.mean([r["ssim"] for r in results]))
  summary = {"step": int(restored), "mean_psnr": mean_psnr,
             "mean_ssim": mean_ssim, "per_image": results}
  with open(os.path.join(out_dir, "metrics.json"), "w") as f:
    json.dump(summary, f, indent=2)
  print(f"mean: psnr={mean_psnr:.2f} ssim={mean_ssim:.4f}")
  return summary


if __name__ == "__main__":
  main(sys.argv[1:])
