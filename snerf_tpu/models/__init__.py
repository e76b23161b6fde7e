"""L2 model graphs (flax.linen): S-NeRF mip model, zip-nerf grid model, poses."""

from snerf_tpu.models.mipnerf import MipNerfConfig, MipNerfModel  # noqa: F401
from snerf_tpu.models.mlp import NerfMLP, ProposalMLP  # noqa: F401
from snerf_tpu.models.posenet import LearnPose  # noqa: F401
