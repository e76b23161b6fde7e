"""L1 primitives: math, encodings, sampling, step functions, rendering, coords."""

from snerf_tpu.ops import coord, lie, math, mip, render, sampling, stepfun  # noqa: F401
from snerf_tpu.ops.rays import Rays  # noqa: F401
