"""Torch-exact functional conv primitives for weight-import parity.

The preprocessing nets (erfnet.py, sdc.py, raftlite.py) must load real
PyTorch checkpoints (the reference ships its preprocessing as external
torch model zoos). These helpers reproduce torch layer semantics exactly
— cross-correlation convs, floor-mode max pooling, transposed convs with
output_padding, eval-mode batchnorm — on NHWC tensors, with parameters
held in nested dicts keyed by the torch module names so a state_dict
maps 1:1.

Conventions: activations NHWC float32; conv kernels HWIO (torch OIHW is
transposed on import); transposed-conv kernels stored pre-flipped so the
forward is a plain dilated conv.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_DN = ("NHWC", "HWIO", "NHWC")


def conv2d(x, w, b=None, stride=(1, 1), padding=(0, 0), dilation=(1, 1)):
  """torch nn.Conv2d equivalent. padding is per-dim symmetric (ph, pw)."""
  pad = [(padding[0], padding[0]), (padding[1], padding[1])]
  y = jax.lax.conv_general_dilated(
      x, w, window_strides=stride, padding=pad,
      rhs_dilation=dilation, dimension_numbers=_DN)
  if b is not None:
    y = y + b
  return y


def conv_transpose2d(x, w_flipped, b=None, stride=2, kernel_size=3,
                     padding=1, output_padding=1):
  """torch nn.ConvTranspose2d equivalent.

  Implemented as a fractionally-strided (lhs-dilated) cross-correlation
  with the spatially-flipped kernel; `w_flipped` must already be flipped
  (import_conv_transpose_weight does this). Effective padding per dim is
  (k-1-p, k-1-p+output_padding).
  """
  lo = kernel_size - 1 - padding
  hi = kernel_size - 1 - padding + output_padding
  y = jax.lax.conv_general_dilated(
      x, w_flipped, window_strides=(1, 1), padding=[(lo, hi), (lo, hi)],
      lhs_dilation=(stride, stride), dimension_numbers=_DN)
  if b is not None:
    y = y + b
  return y


def max_pool2(x):
  """torch nn.MaxPool2d(2, stride=2) (floor mode)."""
  return jax.lax.reduce_window(
      x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def avg_pool2(x):
  s = jax.lax.reduce_window(
      x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
  return s / 4.0


def batchnorm(x, p, eps=1e-3):
  """Eval-mode BatchNorm2d: p = {weight, bias, running_mean, running_var}."""
  inv = jax.lax.rsqrt(p["running_var"] + eps)
  return (x - p["running_mean"]) * inv * p["weight"] + p["bias"]


def relu(x):
  return jax.nn.relu(x)


def upsample2_nearest(x):
  n, h, w, c = x.shape
  return jnp.broadcast_to(
      x[:, :, None, :, None, :], (n, h, 2, w, 2, c)).reshape(
          n, 2 * h, 2 * w, c)


def bilinear_resize(x, shape):
  return jax.image.resize(x, x.shape[:1] + tuple(shape) + x.shape[-1:],
                          method="bilinear")


# ---------------------------------------------------------------------------
# parameter init / torch import
# ---------------------------------------------------------------------------


def init_conv(key, cin, cout, ksize, bias=True):
  """Kaiming-uniform like torch's Conv2d default init."""
  kh, kw = ksize if isinstance(ksize, tuple) else (ksize, ksize)
  fan_in = cin * kh * kw
  bound = 1.0 / np.sqrt(fan_in)
  k1, k2 = jax.random.split(key)
  p = {"weight": jax.random.uniform(k1, (kh, kw, cin, cout),
                                    minval=-bound, maxval=bound)}
  if bias:
    p["bias"] = jax.random.uniform(k2, (cout,), minval=-bound,
                                   maxval=bound)
  return p


def init_bn(cout):
  return {"weight": jnp.ones((cout,)), "bias": jnp.zeros((cout,)),
          "running_mean": jnp.zeros((cout,)),
          "running_var": jnp.ones((cout,))}


def import_conv_weight(w_oihw):
  """torch Conv2d weight (O, I, kh, kw) -> HWIO."""
  return jnp.asarray(np.transpose(np.asarray(w_oihw), (2, 3, 1, 0)))


def import_conv_transpose_weight(w_iohw):
  """torch ConvTranspose2d weight (I, O, kh, kw) -> flipped HWIO."""
  w = np.asarray(w_iohw)[:, :, ::-1, ::-1]          # spatial flip
  return jnp.asarray(np.transpose(w, (2, 3, 0, 1)))  # -> (kh, kw, I, O)


def state_dict_to_numpy(sd):
  """Accepts a torch state_dict (tensors) or an npz mapping; returns
  {name: np.ndarray}."""
  out = {}
  for k, v in dict(sd).items():
    if hasattr(v, "detach"):
      v = v.detach().cpu().numpy()
    out[k] = np.asarray(v)
  return out


def load_state_dict_file(path):
  """Load a .pth (torch.load) or .npz into {name: np.ndarray}."""
  if path.endswith(".npz"):
    return dict(np.load(path))
  import torch
  sd = torch.load(path, map_location="cpu", weights_only=True)
  if isinstance(sd, dict) and "state_dict" in sd:
    sd = sd["state_dict"]
  # strip DataParallel 'module.' prefixes
  return state_dict_to_numpy(
      {k[len("module."):] if k.startswith("module.") else k: v
       for k, v in sd.items()})
