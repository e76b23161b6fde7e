"""snerf_tpu — a TPU-native (JAX/XLA/Pallas/pjit) street-view NeRF framework.

Re-designed from scratch with the capabilities of fudan-zvg/S-NeRF
(S-NeRF ICLR'23 + S-NeRF++ TPAMI'25 + their data-prep toolchain), built
TPU-first: functional JAX transforms, static shapes, SPMD over
`jax.sharding.Mesh`, Pallas kernels for the hot ops.

Layout (mirrors SURVEY.md §7's build plan):
  ops/       L1 math / sampling / rendering primitives (pure JAX)
  models/    L2 model families (flax): mip-NeRF (S-NeRF), zip-NeRF (S-NeRF++)
  data/      L3 host-side dataset loaders + on-device ray generation
  train/     L4 pjit training / evaluation loops, losses, checkpoints
  parallel/  device-mesh + sharding helpers (ICI collectives via XLA)
  sim/       L5 simulation pipeline (S-NeRF++ data generation)
  preprocess/ L6 offline data-preparation toolchain
"""

__version__ = "0.1.0"
