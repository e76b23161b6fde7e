"""L2 model graphs (flax.linen): S-NeRF mip model, zip-nerf grid model,
classic NeRF, pose refinement, confidence, features."""

from snerf_tpu.models.classic import (  # noqa: F401
    ClassicNerfAdapter, ClassicNerfConfig, ClassicNerfModel)
from snerf_tpu.models.confidence import ConfidenceModel  # noqa: F401
from snerf_tpu.models.hashgrid import HashEncoding  # noqa: F401
from snerf_tpu.models.mipnerf import MipNerfConfig, MipNerfModel  # noqa: F401
from snerf_tpu.models.mlp import NerfMLP, ProposalMLP  # noqa: F401
from snerf_tpu.models.posenet import LearnPose  # noqa: F401
from snerf_tpu.models.zipnerf import (  # noqa: F401
    ZipNerfConfig, ZipNerfModel)
