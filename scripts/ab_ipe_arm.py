"""Re-run the ipe arm of the quality A/B at tuned learning rates
(8e-3 diverges for the MLP trunk; hash tables tolerate it)."""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from ab_ipe_vs_hash import COMMON, run  # noqa: E402
from snerf_tpu.data import make_synthetic_scene  # noqa: E402
from snerf_tpu.data.sampler import scene_to_device  # noqa: E402
from snerf_tpu.models.zipnerf import ZipNerfConfig  # noqa: E402


def main():
  scene = make_synthetic_scene(num_images=24, H=192, W=256, datahold=8)
  dev = scene_to_device(scene)
  for lr in (2e-3, 1e-3):
    run(f"ipe-lr{lr}",
        ZipNerfConfig(encoder_type="ipe", ipe_max_deg=14,
                      ipe_density_width=256, ipe_density_depth=4,
                      **COMMON),
        scene, dev, lr=lr)


if __name__ == "__main__":
  main()
