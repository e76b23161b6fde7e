"""Multi-host (pod / DCN) initialization helpers.

TPU-native replacement for the reference's NCCL rendezvous
(s-nerf/utils/device_utils.py:16-29: init_process_group('nccl') at
localhost:12358 + mp.spawn): on TPU pods, jax.distributed.initialize
wires hosts over DCN and jax.devices() spans the whole pod; in-program
collectives ride ICI via XLA SPMD (SURVEY §2.5/§5.8).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None):
  """Initialize the JAX distributed runtime when running multi-host.

  No-op on single-host (the common case in tests/dev). On Cloud TPU
  pods the arguments are auto-detected from the metadata server.

  On the CPU backend (multi-process tests without TPU hardware —
  tests/test_multiprocess_dcn.py) cross-process collectives need the
  gloo implementation; enable it before the backend initializes. This
  mirrors the fake-backend strategy of the virtual mesh (SURVEY §4(c))
  one level up: N real OS processes over the coordination service, the
  actual DCN code path.
  """
  if num_processes is not None and num_processes <= 1:
    return False
  import os
  if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    try:
      jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except (AttributeError, ValueError):
      pass  # older/newer jax without the knob; initialize still works
  try:
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id)
    return True
  except (ValueError, RuntimeError):
    # already initialized, or single-host without coordinator info
    return False


def process_shard(n_items: int):
  """This host's slice of a dataset: the per-rank sharding of the
  reference (zipnerf datasets.py:897-906 local_indices = (i + rank) %
  world_size) expressed with jax process info."""
  rank = jax.process_index()
  world = jax.process_count()
  return np.array([i for i in range(n_items) if (i + rank) % world == 0])


def local_batch_slice(global_batch: int):
  """Per-host batch (datasets.py:317 batch_size // world_size parity)."""
  return global_batch // jax.process_count()
