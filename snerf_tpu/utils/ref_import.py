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


_train_module_cache = None


def _repo_train_module():
  """Load the repo's top-level train.py by path: a bare `import train`
  can resolve to the REFERENCE's train.py when tests put
  /root/reference/s-nerf on sys.path for parity checks."""
  global _train_module_cache
  if _train_module_cache is None:
    import importlib.util
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    spec = importlib.util.spec_from_file_location(
        "_snerf_tpu_train_cli", os.path.join(root, "train.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    _train_module_cache = mod
  return _train_module_cache


repo_train_module = _repo_train_module


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


def map_zip_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
  """Reference zip-nerf Model state_dict -> our flax param tree.

  Key layout (s-nerfpp/zipnerf/internal/models.py:64-77,354-480):
    {nerf_mlp,prop_mlp_i}.encoder.embeddings  hash table [total, dim]
      (same per-level offsets math as our GridSpec — grid.py:122-144
      parity, so rows copy 1:1)
    .density_layer.0 / .density_layer.2       -> density_hidden / _out
    .lin_second_stage_{i}                     -> view_{i}
    .rgb_layer                                -> rgb_out
    .normal_layer / .roughness_layer          -> normals/roughness heads
    .lin_glo_{i}                              -> glo_{i}
    glo_vecs (model-level Embedding)          -> glo_vecs.embedding
  Buffers (encoder.offsets/grid_sizes/idx) are skipped; any UNMAPPED
  weight (e.g. scale_featurization or RefNeRF diffuse/specular
  variants we don't model) raises instead of being dropped silently.
  """
  sd = _strip_module(sd)
  used = set()

  def dense(prefix):
    used.update({prefix + ".weight", prefix + ".bias"})
    return {"kernel": sd[prefix + ".weight"].T.copy(),
            "bias": sd[prefix + ".bias"].copy()}

  def one_mlp(p):
    m = {}
    if p + ".encoder.embeddings" in sd:
      m["grid"] = {"table": np.asarray(sd[p + ".encoder.embeddings"],
                                       np.float32)}
      used.add(p + ".encoder.embeddings")
    m["density_hidden"] = dense(p + ".density_layer.0")
    m["density_out"] = dense(p + ".density_layer.2")
    i = 0
    while f"{p}.lin_second_stage_{i}.weight" in sd:
      m[f"view_{i}"] = dense(f"{p}.lin_second_stage_{i}")
      i += 1
    for ref_name, ours in (("rgb_layer", "rgb_out"),
                           ("normal_layer", "normals_head"),
                           ("roughness_layer", "roughness_head")):
      if f"{p}.{ref_name}.weight" in sd:
        m[ours] = dense(f"{p}.{ref_name}")
    j = 0
    while f"{p}.lin_glo_{j}.weight" in sd:
      m[f"glo_{j}"] = dense(f"{p}.lin_glo_{j}")
      j += 1
    return m

  if "nerf_mlp.density_layer.0.weight" not in sd:
    raise ValueError("not a reference zip-nerf Model state_dict "
                     f"(keys: {sorted(sd)[:5]}...)")
  out = {"nerf_mlp": one_mlp("nerf_mlp")}
  i = 0
  while f"prop_mlp_{i}.density_layer.0.weight" in sd:
    out[f"prop_mlp_{i}"] = one_mlp(f"prop_mlp_{i}")
    i += 1
  if "glo_vecs.weight" in sd:
    out["glo_vecs"] = {"embedding": sd["glo_vecs.weight"].copy()}
    used.add("glo_vecs.weight")

  # GridEncoder non-parameter buffers ride along in the state_dict
  _buffers = (".encoder.offsets", ".encoder.grid_sizes", ".encoder.idx",
              ".encoder.init_std")
  leftovers = sorted(k for k in sd if k not in used
                     and not k.endswith(_buffers))
  if leftovers:
    raise ValueError(
        f"unmapped reference weights (unsupported variant?): {leftovers}")
  return out


def import_reference_zip_ckpt(ckpt_path: str, cfg):
  """Load a reference zip-nerf checkpoint_<step>.ckpt, return
  (flax TrainState, step). Same contract as import_reference_tar."""
  import jax
  import torch

  from snerf_tpu.train.zip_trainer import create_zip_train_state

  ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
  step = int(ckpt.get("step", 0))
  params = map_zip_state_dict(ckpt.get("state_dict", ckpt))

  with jax.default_device(jax.devices("cpu")[0]):
    _, state = create_zip_train_state(
        jax.random.PRNGKey(0), cfg.zip_model_config(),
        cfg.zip_train_config())
  _check_shapes(params, state.params)
  return state.replace(params=params), step


def _check_shapes(params, target_params):
  import jax

  def shapes(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {jax.tree_util.keystr(k): np.shape(v) for k, v in flat}

  ref_shapes, ours_shapes = shapes(params), shapes(target_params)
  if ref_shapes != ours_shapes:
    diff = {k: (ref_shapes.get(k), ours_shapes.get(k))
            for k in set(ref_shapes) | set(ours_shapes)
            if ref_shapes.get(k) != ours_shapes.get(k)}
    raise ValueError(
        "imported parameter shapes do not match the config "
        f"(imported vs config): {diff}\n"
        "pass the experiment's own args.txt/config as --config")


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

  _check_shapes(params, state.params)
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
