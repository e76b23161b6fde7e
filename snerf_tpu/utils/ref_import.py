"""Import reference S-NeRF torch checkpoints into snerf_tpu.

Migration tool for users switching from the reference implementation:
maps a reference `.tar` checkpoint (s-nerf/train.py:264-273 saves
{global_step, model_param, optimzer, confidence, optimizer_conf}) onto
our flax parameter tree, so a reference-trained scene can be evaluated,
rendered, or fine-tuned here without retraining.

Key layout of the reference MipNerfModel state_dict
(s-nerf/model/models.py:217-325):
  mlp.layers.{i}.layers.0.{weight,bias}        trunk DenseBlocks
  mlp.density_layer.{weight,bias}
  mlp.bottleneck_layer.layers.0.{weight,bias}
  mlp.cond_layers.{j}.layers.0.{weight,bias}   viewdir branch
  mlp.rgb_layer.{weight,bias}
  mlp.semantic_layer.0.layers.0 / .1           optional semantic head
  proposal.layers.{i}.layers.0 / density_layer proposal net
Ours (snerf_tpu/models/mlp.py): trunk_{i} / density / bottleneck /
cond_{j} / rgb / semantic_hidden / semantic, under {"mlp","proposal"}.

Optimizer moments are NOT imported (torch Adam state is not portable
to optax); resuming training from an imported checkpoint restarts the
optimizer, which the reference itself survives on resume.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np


def _repo_train_module():
  """Load the repo's top-level train.py by path: a bare `import train`
  can resolve to the REFERENCE's train.py when tests put
  /root/reference/s-nerf on sys.path for parity checks."""
  import importlib.util
  root = os.path.dirname(os.path.dirname(os.path.dirname(
      os.path.abspath(__file__))))
  spec = importlib.util.spec_from_file_location(
      "_snerf_tpu_train_cli", os.path.join(root, "train.py"))
  mod = importlib.util.module_from_spec(spec)
  spec.loader.exec_module(mod)
  return mod


def _strip_module(sd: Dict[str, Any]) -> Dict[str, np.ndarray]:
  """Drop the DataParallel/DDP 'module.' prefix, tensors -> numpy."""
  out = {}
  for k, v in sd.items():
    if k.startswith("module."):
      k = k[len("module."):]
    out[k] = np.asarray(getattr(v, "detach", lambda: v)().cpu().numpy()
                        if hasattr(v, "detach") else v, np.float32)
  return out


def map_mip_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
  """Reference MipNerfModel state_dict -> our flax param tree."""
  sd = _strip_module(sd)

  def dense(prefix):
    return {"kernel": sd[prefix + ".weight"].T.copy(),
            "bias": sd[prefix + ".bias"].copy()}

  mlp = {}
  i = 0
  while f"mlp.layers.{i}.layers.0.weight" in sd:
    mlp[f"trunk_{i}"] = dense(f"mlp.layers.{i}.layers.0")
    i += 1
  if i == 0:
    raise ValueError("not a reference MipNerfModel state_dict "
                     f"(no mlp.layers.*; keys: {sorted(sd)[:5]}...)")
  mlp["density"] = dense("mlp.density_layer")
  mlp["bottleneck"] = dense("mlp.bottleneck_layer.layers.0")
  j = 0
  while f"mlp.cond_layers.{j}.layers.0.weight" in sd:
    mlp[f"cond_{j}"] = dense(f"mlp.cond_layers.{j}.layers.0")
    j += 1
  mlp["rgb"] = dense("mlp.rgb_layer")
  if "mlp.semantic_layer.0.layers.0.weight" in sd:
    mlp["semantic_hidden"] = dense("mlp.semantic_layer.0.layers.0")
    mlp["semantic"] = dense("mlp.semantic_layer.1")

  proposal = {}
  i = 0
  while f"proposal.layers.{i}.layers.0.weight" in sd:
    proposal[f"trunk_{i}"] = dense(f"proposal.layers.{i}.layers.0")
    i += 1
  proposal["density"] = dense("proposal.density_layer")
  return {"mlp": mlp, "proposal": proposal}


def map_confidence_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
  """Reference Confidence module -> our conf_params {'lambdas': ...}.

  The reference learns one weight per (image, mode)
  (model/confidence.py:65-112); ours stores the same [n_images,
  n_modes] table under 'lambdas'.
  """
  sd = _strip_module(sd)
  for key in ("weights", "lambdas", "conf_weights"):
    if key in sd:
      return {"lambdas": np.asarray(sd[key], np.float32)}
  raise ValueError(f"no confidence weight table found in {sorted(sd)}")


def import_reference_tar(tar_path: str, cfg, num_images: int):
  """Load a reference .tar, return (flax TrainState, step).

  The returned state is a freshly-initialized TrainState (matching
  `cfg`) whose model params are replaced by the imported weights —
  save it with checkpoints.save_checkpoint to make it a native
  experiment.
  """
  import jax
  import torch

  build_model_state = _repo_train_module().build_model_state

  ckpt = torch.load(tar_path, map_location="cpu", weights_only=False)
  step = int(ckpt.get("global_step", 0))
  sd = ckpt.get("model_param", ckpt)
  params = map_mip_state_dict(sd)

  with jax.default_device(jax.devices("cpu")[0]):
    _, _, state = build_model_state(cfg, cfg.train_config(), num_images)

  def shapes(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {jax.tree_util.keystr(k): np.shape(v) for k, v in flat}

  ref_shapes, ours_shapes = shapes(params), shapes(state.params)
  if ref_shapes != ours_shapes:
    diff = {k: (ref_shapes.get(k), ours_shapes.get(k))
            for k in set(ref_shapes) | set(ours_shapes)
            if ref_shapes.get(k) != ours_shapes.get(k)}
    raise ValueError(
        "imported parameter shapes do not match the config "
        f"(imported vs config): {diff}\n"
        "pass the experiment's own args.txt/config as --config")
  state = state.replace(params=jax.tree_util.tree_map(
      lambda x: np.asarray(x), params))

  if state.conf_params is not None and ckpt.get("confidence") is not None:
    try:
      conf = map_confidence_state_dict(ckpt["confidence"])
      if np.shape(conf["lambdas"]) == np.shape(
          state.conf_params["lambdas"]):
        state = state.replace(conf_params=conf)
    except ValueError:
      pass  # keep fresh confidence params
  return state, step
