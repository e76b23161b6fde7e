"""Checkpoint save/restore with resume-latest semantics (orbax-backed).

Behavioral parity targets:
  reference s-nerf/train.py:264-280 (ckpt every i_weights with model +
  optimizer + confidence states; pose net saved as a separate stream),
  s-nerf/utils/model_utils.py:44-63 (resume last sorted ckpt),
  s-nerfpp/zipnerf/internal/checkpoints.py:6-95 (step-suffixed dirs,
  natural sort, keep-k pruning, posenet_ckpt_ prefix).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


def _manager(ckpt_dir: str, keep: int = 3) -> ocp.CheckpointManager:
  options = ocp.CheckpointManagerOptions(max_to_keep=keep, create=True)
  return ocp.CheckpointManager(os.path.abspath(ckpt_dir), options=options)


def save_checkpoint(ckpt_dir: str, state: Any, step: int, keep: int = 3,
                    wait: bool = False):
  """Save a pytree state under ckpt_dir/<step>/ (async by default)."""
  mngr = _manager(ckpt_dir, keep)
  mngr.save(step, args=ocp.args.StandardSave(state))
  if wait:
    mngr.wait_until_finished()
  return mngr


def latest_step(ckpt_dir: str) -> Optional[int]:
  if not os.path.isdir(ckpt_dir):
    return None
  mngr = _manager(ckpt_dir)
  return mngr.latest_step()


def _host_target(target: Any) -> Any:
  """Mirror `target` with host (numpy) leaves so orbax restores straight
  to host RAM instead of device_put-ing every shard onto the accelerator.

  Over the tunneled TPU a direct-to-device restore of a full train state
  (params + two Adam moment trees, incl. multi-MB hash tables) takes
  minutes; restore-to-host + ONE batched jax.device_put of the subtree
  the caller actually needs is the fast path.
  """
  import jax
  import numpy as np

  def conv(x):
    if hasattr(x, "shape") and hasattr(x, "dtype"):
      return np.empty(x.shape, x.dtype)
    return x

  return jax.tree_util.tree_map(conv, target)


def restore_checkpoint(ckpt_dir: str, target: Any,
                       step: Optional[int] = None, host: bool = False):
  """Restore the given (or latest) step into the structure of `target`.

  host=True restores to numpy on the host (no accelerator transfers);
  the caller device_puts whatever subtree it needs in one batch.
  Returns (state, step) or (target, None) when no checkpoint exists.
  """
  mngr = _manager(ckpt_dir)
  step = step if step is not None else mngr.latest_step()
  if step is None:
    return target, None
  if host:
    target = _host_target(target)
  restored = mngr.restore(step, args=ocp.args.StandardRestore(target))
  return restored, step


def save_pose_checkpoint(exp_dir: str, pose_params: Any, step: int,
                         keep: int = 3, wait: bool = False):
  """Separate pose-net checkpoint stream (reference keeps the pose ckpt
  apart from the model: s-nerf/train.py:275-280 pose/ subdir; zipnerf
  checkpoints.py posenet_ckpt_ prefix) — lets pose refinements be mixed
  across model checkpoints."""
  return save_checkpoint(os.path.join(exp_dir, "pose"),
                         {"pose_params": pose_params}, step, keep=keep,
                         wait=wait)


def restore_pose_checkpoint(exp_dir: str, target_pose_params: Any,
                            step: Optional[int] = None):
  restored, got = restore_checkpoint(
      os.path.join(exp_dir, "pose"),
      {"pose_params": target_pose_params}, step=step)
  return restored["pose_params"], got
