"""Analytic (no-training) test of the scene-b FEATURE-WASHOUT
hypothesis (round-5).

Hypothesis: the wide-FoV scene-b collapse is not an optimization knob
problem at all — the cast Gaussians' stds, expressed in GRID units at
each CP level, are so large on scene-b geometry that the integrated-CP
profile w (a normalized RBF row over R cells) spans tens of cells and
the level features decay to the table's global mean (the documented
`test_large_std_decays_to_global_mean` behavior): the trunk receives
(near-)ZERO spatial signal, the best achievable fit IS the constant
color, and no lr/init/schedule knob can help. Scene-a's narrower FoV
keeps enough levels sharp to train.

Method: build the cns ZipNerf at init on each scene, run ONE forward
on a probe ray batch capturing (x01, std01) at the nerf level via an
intermediates hook... the model does not expose them, so instead
reproduce its exact cast chain (cast_rays multisample -> scene_scale
contract -> /4 normalization, models/zipnerf.py:380-420) on real rays
of each scene, then report per level: the std in grid cells and the
INIT feature std across probe positions (spatial signal reaching the
trunk), plus the same under the anisotropic n=1 cast.

Usage: python scripts/probe_scene_b_washout.py [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--cpu", action="store_true")
  args = ap.parse_args()
  import jax
  if args.cpu:
    jax.config.update("jax_platforms", "cpu")
  import jax.numpy as jnp
  from snerf_tpu.data import make_synthetic_scene
  from snerf_tpu.data.raygen import rays_for_image
  from snerf_tpu.models.cpgrid import CPEncoding, level_resolutions
  from snerf_tpu.ops import coord, render

  scenes = {
      "a": make_synthetic_scene(num_images=24, H=192, W=256,
                                datahold=8),
      "b": make_synthetic_scene(num_images=24, H=160, W=160, focal=80.0,
                                detail_blobs=48, datahold=8),
  }
  resolutions = level_resolutions(4, 128, 1024)
  enc = CPEncoding(num_levels=4, level_dim=16, base_resolution=128,
                   max_resolution=1024)

  for name, sc in scenes.items():
    ti = int(np.asarray(sc.i_train)[0])
    rays = rays_for_image(jnp.asarray(sc.poses[ti]),
                          jnp.asarray(sc.intrinsics[ti]),
                          sc.hw[0], sc.hw[1], sc.near, sc.far)
    flat = jax.tree_util.tree_map(
        lambda x: x.reshape(-1, x.shape[-1]), rays)
    idx = np.linspace(0, flat.origins.shape[0] - 1, 512).astype(int)
    r = jax.tree_util.tree_map(lambda x: x[idx], flat)

    # the cns sampling chain at init: uniform sdist over the power
    # warp is irrelevant for the WIDTH question — take the nerf
    # level's 8 uniform intervals in s and cast exactly as the model
    # does (multisample n=3, collapse like cp_collapse_multisamples).
    _, s_to_t = coord.construct_ray_warps(
        "power_transformation", r.near, r.far, lam=-1.5)
    sdist = jnp.linspace(0.0, 1.0, 9)[None, :] * jnp.ones(
        (r.near.shape[0], 1))
    tdist = s_to_t(sdist)
    d = r.directions
    up = jnp.array([0.0, 0.0, 1.0])
    bx = jnp.cross(d, jnp.broadcast_to(up, d.shape))
    bx = bx / (jnp.linalg.norm(bx, axis=-1, keepdims=True) + 1e-9)
    by = jnp.cross(d, bx)
    by = by / (jnp.linalg.norm(by, axis=-1, keepdims=True) + 1e-9)
    means, stds = render.cast_rays_multisample(
        None, tdist, r.origins, d, r.radii[..., 0], bx, by, n=3, m=3)
    # collapse (mean of means + spread, models/cpgrid.py __call__)
    m1 = means.mean(axis=-2)                       # [..., S, 3]
    spread = ((means - m1[..., None, :]) ** 2).mean(axis=-2).mean(-1)
    var = (stds ** 2).mean(axis=-1) + spread       # [..., S]
    z, new_std = coord.contract_mean_std(m1, jnp.sqrt(var))
    x01 = (z / 2.0 + 1.0) / 2.0
    std01 = new_std / 4.0

    x = x01.reshape(-1, 1, 3)
    s01 = std01.reshape(-1, 1)
    v = enc.init(jax.random.PRNGKey(0), x[:4], s01[:4])
    feats = np.asarray(enc.apply(v, x, s01))
    print(f"scene {name}: std01 median {float(jnp.median(std01)):.5f} "
          f"p90 {float(jnp.percentile(std01, 90)):.5f}")
    for li, rr in enumerate(resolutions):
      cells = float(jnp.median(std01)) * (rr - 1)
      f = feats[:, li * 16:(li + 1) * 16]
      print(f"  level {li} res {rr:5d}: sigma {cells:8.2f} cells | "
            f"init feature spatial std {float(f.std(0).mean()):.5f}")


if __name__ == "__main__":
  main()
