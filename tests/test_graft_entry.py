"""Driver-contract tests for __graft_entry__ (the externally-checked API).

dryrun_multichip must build its own forced-CPU virtual mesh in a subprocess
(round-1 failure: it used the ambient platform and died / built a 1-device
mesh). We run it from a parent whose env still carries the TPU-plugin vars
to prove the subprocess scrubbing works.
"""

import sys


sys.path.insert(0, "/root/repo")


def test_dryrun_multichip_subprocess():
  import __graft_entry__ as g
  # n=4 (cheaper than 8, and != the conftest's 8 so a leaked setting fails
  # the exact-count assert inside the subprocess).
  g.dryrun_multichip(4)


def test_entry_returns_jittable():
  import jax
  import __graft_entry__ as g
  fn, example_args = g.entry()
  out = jax.jit(fn)(*example_args)
  rgb = out[0]
  assert rgb.shape[-1] == 3
  assert bool(jax.numpy.isfinite(rgb).all())
