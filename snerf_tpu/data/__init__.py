"""L3 data layer: host-side scene loaders + on-device ray generation.

TPU-first design (SURVEY.md §7 step 3): the whole scene (images as uint8,
poses, intrinsics, depths) lives in HBM; per-step ray batches are generated
INSIDE the jitted train step from (pose, K, pixel-id) — no host-side ray
workers (replaces reference rayset.py SingleImage and zipnerf
datasets.py:489 CPU cast_ray_batch).
"""

from snerf_tpu.data.raygen import pixels_to_rays, rays_for_image  # noqa: F401
from snerf_tpu.data.scene import Scene  # noqa: F401
from snerf_tpu.data.synthetic import make_synthetic_scene  # noqa: F401
