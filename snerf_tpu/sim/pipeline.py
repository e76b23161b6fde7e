"""Simulation orchestrator: the in-process replacement for config_run.py.

Behavioral parity target: reference s-nerfpp/config_run.py:20-148 — the
7-stage shell chain (background render -> placement -> foreground render
-> composition -> inpainting -> shadows -> annotation) with wkdir_<gpu>
filesystem IPC. Here each stage is a function call passing arrays
(SURVEY.md §3.4 note: "the TPU rebuild should replace this with an
in-process pipeline around a batch render API").

The inpainting model is a pluggable callable (the reference downloads a
pretrained LaMa `inpaint` package, stage2_code/inpainting_fig.py:14-96):
  inpaint_fn(rgb [H,W,3] float, mask [H,W] bool) -> rgb
The default fallback is OpenCV Telea inpainting.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence

import numpy as np

from snerf_tpu.sim import annotate, compose, placement, shadows
from snerf_tpu.sim.mesh import AssetBank


@dataclasses.dataclass
class SimConfig:
  """configs/car.yaml analog."""
  n_images: int = 70
  n_instances_per_image: int = 2
  categories: Sequence[str] = ("vehicle",)
  drivable_idx: int = 0
  undrivable_idx: Sequence[int] = (1,)
  obstacle_idx: Sequence[int] = (2,)
  paste_semantic_id: int = 13     # cityscapes 'car'
  reject_r: float = 3.0
  sun_pitch_deg: float = 30.0
  sun_yaw_deg: float = 45.0
  enable_shadows: bool = True
  enable_inpaint: bool = True
  enable_relight: bool = True
  # "auto": the in-repo AOT-GAN generator for the paste-boundary-band
  # call site (beats Telea by +6.3 dB held-out hole PSNR on band masks,
  # scripts/eval_inpaint.py), Telea if the packaged weights are absent.
  # "telea": force the classical arm everywhere.
  inpaint_arm: str = "auto"
  seed: int = 0


def default_inpaint_fn(rgb, mask):
  """OpenCV Telea fallback for the LaMa boundary inpaint."""
  import cv2
  img8 = (np.clip(rgb, 0, 1) * 255).astype(np.uint8)
  out = cv2.inpaint(img8, mask.astype(np.uint8) * 255, 3,
                    cv2.INPAINT_TELEA)
  return out.astype(np.float32) / 255.0


def auto_inpaint_fn():
  """Call-site-calibrated default (held-out hole-PSNR table,
  scripts/eval_inpaint.py): the learned AOT-GAN wins the compose
  paste-boundary bands (31.99 vs 25.73 dB) and loses large
  relight-style rectangles (18.46 vs 22.91) — but the relight pass
  never reaches a plain inpaint_fn (it requires a `light=True` kwarg,
  apply_relight_pass below), so the learned net serves only the mask
  family where it wins. Falls back to Telea when the packaged weights
  are unavailable."""
  try:
    from snerf_tpu.preprocess.nets import aotgan
    return aotgan.make_inpaint_fn()
  except Exception:
    return default_inpaint_fn


def default_relight_fn(rgb, mask):
  """Fallback for the LaMa `light=True` relight pass
  (inpainting_fig.py:88-96): harmonize the masked region's luminance
  toward the surrounding ring (handle_lighting-style brightness blend)."""
  import cv2
  if not mask.any():
    return rgb
  ring = cv2.dilate(mask.astype(np.uint8), np.ones((7, 7), np.uint8))
  ring = ring.astype(bool) & ~mask
  lum = rgb.mean(axis=-1)
  target = float(lum[ring].mean()) if ring.any() else float(lum.mean())
  cur = float(lum[mask].mean())
  scale = np.clip(target / max(cur, 1e-6), 0.6, 1.6)
  out = rgb.copy()
  out[mask] = np.clip(rgb[mask] * (0.5 + 0.5 * scale), 0.0, 1.0)
  return out


def relight_dilation_radius(mask) -> int:
  """r = (horizontal mask extent / 80)^0.82 (inpainting_fig.py:76-80)."""
  j = np.where(mask.any(axis=0))[0]
  if j.size == 0:
    return 1
  return max(1, int(((j.max() - j.min()) / 80.0) ** 0.82))


def apply_relight_pass(rgb, relight_mask, inpaint_fn=None):
  """Second inpaint call in relight mode over the dilated vehicle masks
  (stage2_code/inpainting_fig.py:64-96; VERDICT r2 missing #5).

  inpaint_fn may accept (rgb, mask, light=True); plug-ins without a
  `light` kwarg fall back to the brightness-harmonization default."""
  import cv2
  import inspect
  if not relight_mask.any():
    return rgb
  r = relight_dilation_radius(relight_mask)
  kernel = cv2.getStructuringElement(cv2.MORPH_RECT, (r, r))
  mask_d = cv2.dilate(relight_mask.astype(np.uint8), kernel).astype(bool)
  if inpaint_fn is not None:
    try:
      if "light" in inspect.signature(inpaint_fn).parameters:
        return inpaint_fn(rgb, mask_d, light=True)
    except (TypeError, ValueError):
      pass
  return default_relight_fn(rgb, mask_d)


def run_simulation(background_views: List[dict],
                   asset_bank: AssetBank,
                   cfg: SimConfig,
                   out_root: str,
                   scene_name: str = "scene",
                   inpaint_fn: Optional[Callable] = None):
  """Full pipeline over pre-rendered background views.

  background_views: list of dicts with rgb [H,W,3] float, depth [H,W]
  metric, semantic [H,W] int, c2w [4,4] (raw/OpenCV +z-forward pose),
  K [3,3]. Produced by render.py --render_mode random (the batch render
  API). Returns the annotation run directory.
  """
  rng = np.random.RandomState(cfg.seed)
  if inpaint_fn is not None or not cfg.enable_inpaint:
    inpaint = inpaint_fn
  else:
    inpaint = (auto_inpaint_fn() if cfg.inpaint_arm == "auto"
               else default_inpaint_fn)

  # --- stage 0: placement map from all views -----------------------------
  depths = np.stack([v["depth"] for v in background_views])
  sems = np.stack([v["semantic"] for v in background_views])
  Ks = np.stack([v["K"] for v in background_views])
  c2ws = np.stack([v["c2w"] for v in background_views])
  pts, labs = placement.unproject_depth_semantic(
      depths, sems, Ks, c2ws, rng=rng)
  bev = placement.build_bev(pts, labs, cfg.drivable_idx,
                            cfg.undrivable_idx, cfg.obstacle_idx)
  positions = placement.generate_positions(
      bev, c2ws, Ks, n_per_pose=cfg.n_instances_per_image,
      reject_r=cfg.reject_r, seed=cfg.seed)

  # --- per view: foreground render + composition + shadows + inpaint -----
  frames = []
  for v, view in enumerate(background_views):
    w2c = np.linalg.inv(view["c2w"])
    hw = view["depth"].shape
    instances = []
    for pos in positions[v]:
      category = cfg.categories[rng.randint(len(cfg.categories))]
      try:
        asset = asset_bank.sample_asset(category, rng)
      except FileNotFoundError:
        continue
      instances.append(compose.Instance(
          verts=asset.verts, faces=asset.faces, colors=asset.colors,
          uvs=asset.uvs, texture=asset.texture,
          position=np.asarray(pos, np.float32),
          yaw_deg=float(rng.uniform(0, 360)), category=category))

    fused = compose.compose_view(
        view["rgb"], view["depth"], view["semantic"], instances,
        w2c[:3, :4], view["K"], semantic_id=cfg.paste_semantic_id)

    rgb = fused["rgb"]
    if inpaint is not None and fused["inpaint_band"].any():
      rgb = inpaint(rgb, fused["inpaint_band"])
    if cfg.enable_relight:
      rgb = apply_relight_pass(rgb, fused["relight_mask"],
                               inpaint_fn=inpaint)

    if cfg.enable_shadows and instances:
      all_masks = np.any(np.stack(fused["masks"]), 0) \
          if fused["masks"] else None
      for inst in instances:
        smask = shadows.render_shadow(
            inst.world_verts(), w2c[:3, :4], view["K"], hw,
            pitch_deg=cfg.sun_pitch_deg, yaw_deg=cfg.sun_yaw_deg)
        rgb = shadows.apply_shadow(rgb, smask, object_masks=all_masks)

    frames.append(dict(rgb=rgb, depth=fused["depth"],
                       semantic=fused["semantic"],
                       bboxes=fused["bboxes"]))

  return annotate.write_annotation(
      out_root, scene_name, frames,
      render_poses=c2ws, intrinsics=Ks,
      bev_results={"x_scale": bev["x_scale"], "y_scale": bev["y_scale"],
                   "x_ori_bias": bev["x_ori_bias"],
                   "y_ori_bias": bev["y_ori_bias"]})
