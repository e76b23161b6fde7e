"""L3 data layer: host-side scene loaders + on-device ray generation.

TPU-first design (SURVEY.md §7 step 3): the whole scene (images as uint8,
poses, intrinsics, depths) lives in HBM; per-step ray batches are generated
INSIDE the jitted train step from (pose, K, pixel-id) — no host-side ray
workers (replaces reference rayset.py SingleImage and zipnerf
datasets.py:489 CPU cast_ray_batch).
"""

from snerf_tpu.data.raygen import (  # noqa: F401
    pixels_to_rays, rays_for_image, rays_for_panorama)
from snerf_tpu.data.scene import Scene, load_nuscenes_scene  # noqa: F401
from snerf_tpu.data.synthetic import make_synthetic_scene  # noqa: F401


def load_scene_by_type(dataset_type: str, datadir: str, **kwargs):
  """Loader dispatch (reference dataloader.load_dataset parity)."""
  if dataset_type == "nuscenes":
    return load_nuscenes_scene(datadir, **kwargs)
  if dataset_type == "waymo":
    from snerf_tpu.data.waymo import load_waymo_scene
    return load_waymo_scene(datadir, **kwargs)
  if dataset_type == "llff":
    from snerf_tpu.data.llff import load_llff_scene
    return load_llff_scene(datadir, **kwargs)
  if dataset_type == "blender":
    from snerf_tpu.data.blender import load_blender_scene
    return load_blender_scene(datadir, **kwargs)
  if dataset_type == "synthetic":
    return make_synthetic_scene(**kwargs)
  if dataset_type == "dtu":
    from snerf_tpu.data.dtu import load_dtu_scene
    return load_dtu_scene(datadir, **kwargs)
  if dataset_type == "tat_nerfpp":
    from snerf_tpu.data.tnt import load_tnt_scene
    return load_tnt_scene(datadir, **kwargs)
  if dataset_type == "tat_fvs":
    from snerf_tpu.data.tnt import load_tnt_fvs_scene
    return load_tnt_fvs_scene(datadir, **kwargs)
  raise ValueError(f"unknown dataset_type {dataset_type!r}")
