"""ERFNet (Romera et al. 2017) — exact architecture parity with the
reference's Sparse-Depth-Completion/Models/ERFNet.py:1-151, in JAX.

One implementation serves two reference roles:
  - depth-completion global net (sdc.py wraps it; Models/model.py:23)
  - semantic segmentation (ERFNet's original task — the in-repo
    replacement for the mseg external, preprocess P7)

Parameters are nested dicts keyed by the torch module names
("encoder.initial_block.conv", ...) so a real checkpoint's state_dict
imports 1:1 (import_state_dict). Dropout is inference-mode (identity),
batchnorm eval-mode — matching how the reference runs these nets in its
pipeline (Test/test.py inference only).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from snerf_tpu.preprocess.nets import torchconv as T


def module_defs(in_channels: int, out_channels: int):
  """(name, kind, args) registry mirroring ERFNet.py:63-151 exactly."""
  chans = 32 if in_channels > 16 else 16
  mods = [("encoder.initial_block", "down", (in_channels, chans)),
          ("encoder.layers.0", "down", (chans, 64))]
  for i in range(5):
    mods.append((f"encoder.layers.{i + 1}", "nb1d", (64, 1)))
  mods.append(("encoder.layers.6", "down", (64, 128)))
  idx = 7
  for _ in range(2):
    for d in (2, 4, 8, 16):
      mods.append((f"encoder.layers.{idx}", "nb1d", (128, d)))
      idx += 1
  mods += [("decoder.layer1", "up", (128, 64)),
           ("decoder.layer2", "nb1d", (64, 1)),
           ("decoder.layer3", "nb1d", (64, 1)),
           ("decoder.layer4", "up", (64, 32)),
           ("decoder.layer5", "nb1d", (32, 1)),
           ("decoder.layer6", "nb1d", (32, 1)),
           ("decoder.output_conv", "convT2", (32, out_channels))]
  return mods


def init_params(key, in_channels: int, out_channels: int):
  params = {}
  for name, kind, args in module_defs(in_channels, out_channels):
    key, k = jax.random.split(key)
    cin, x = args
    if kind == "down":
      cout = x
      params[name] = {
          "conv": T.init_conv(k, cin, cout - cin, 3),
          "bn": T.init_bn(cout)}
    elif kind == "nb1d":
      ch = cin
      ks = jax.random.split(k, 4)
      params[name] = {
          "conv3x1_1": T.init_conv(ks[0], ch, ch, (3, 1)),
          "conv1x3_1": T.init_conv(ks[1], ch, ch, (1, 3)),
          "bn1": T.init_bn(ch),
          "conv3x1_2": T.init_conv(ks[2], ch, ch, (3, 1)),
          "conv1x3_2": T.init_conv(ks[3], ch, ch, (1, 3)),
          "bn2": T.init_bn(ch)}
    elif kind == "up":
      cout = x
      params[name] = {"conv": T.init_conv(k, cin, cout, 3),
                      "bn": T.init_bn(cout)}
    elif kind == "convT2":
      cout = x
      params[name] = {"conv": T.init_conv(k, cin, cout, 2)}
  return params


def _down(p, x):
  """DownsamplerBlock (ERFNet.py:11-22): cat(conv s2, maxpool) -> bn -> relu."""
  y = jnp.concatenate(
      [T.conv2d(x, p["conv"]["weight"], p["conv"]["bias"],
                stride=(2, 2), padding=(1, 1)),
       T.max_pool2(x)], axis=-1)
  return T.relu(T.batchnorm(y, p["bn"]))


def _nb1d(p, x, dilated: int):
  """non_bottleneck_1d (ERFNet.py:25-60), inference (no dropout)."""
  y = T.relu(T.conv2d(x, p["conv3x1_1"]["weight"], p["conv3x1_1"]["bias"],
                      padding=(1, 0)))
  y = T.conv2d(y, p["conv1x3_1"]["weight"], p["conv1x3_1"]["bias"],
               padding=(0, 1))
  y = T.relu(T.batchnorm(y, p["bn1"]))
  y = T.relu(T.conv2d(y, p["conv3x1_2"]["weight"], p["conv3x1_2"]["bias"],
                      padding=(dilated, 0), dilation=(dilated, 1)))
  y = T.conv2d(y, p["conv1x3_2"]["weight"], p["conv1x3_2"]["bias"],
               padding=(0, dilated), dilation=(1, dilated))
  y = T.batchnorm(y, p["bn2"])
  return T.relu(y + x)


def _up(p, x):
  """UpsamplerBlock (ERFNet.py:99-108): convT k3 s2 p1 op1 -> bn -> relu."""
  y = T.conv_transpose2d(x, p["conv"]["weight"], p["conv"]["bias"],
                         stride=2, kernel_size=3, padding=1,
                         output_padding=1)
  return T.relu(T.batchnorm(y, p["bn"]))


def apply(params, x, in_channels: int, out_channels: int,
          return_embeddings: bool = False):
  """x NHWC -> (out, em1, em2) like Net.forward (ERFNet.py:139-151).

  em2/em1 are the decoder features at 1/4 and 1/2 resolution consumed by
  the SDC hourglass local net (model.py:44,66)."""
  em1 = em2 = None
  for name, kind, args in module_defs(in_channels, out_channels):
    p = params[name]
    if kind == "down":
      x = _down(p, x)
    elif kind == "nb1d":
      x = _nb1d(p, x, args[1])
    elif kind == "up":
      x = _up(p, x)
    elif kind == "convT2":
      x = T.conv_transpose2d(x, p["conv"]["weight"], p["conv"]["bias"],
                             stride=2, kernel_size=2, padding=0,
                             output_padding=0)
    if name == "decoder.layer3":
      em2 = x
    elif name == "decoder.layer6":
      em1 = x
  if return_embeddings:
    return x, em1, em2
  return x


def import_state_dict(sd, in_channels: int, out_channels: int,
                      prefix: str = ""):
  """torch Net(in_channels, out_channels).state_dict() -> params.

  Accepts tensors or numpy; ignores the encoder-only output_conv
  (ERFNet.py:85, unused in full-net mode) and dropout's empty state."""
  sd = T.state_dict_to_numpy(sd)
  if prefix:
    sd = {k[len(prefix):]: v for k, v in sd.items()
          if k.startswith(prefix)}
  params = {}
  for name, kind, args in module_defs(in_channels, out_channels):
    if kind == "down" or kind == "up":
      conv_w = T.import_conv_weight(sd[f"{name}.conv.weight"]) \
          if kind == "down" else \
          T.import_conv_transpose_weight(sd[f"{name}.conv.weight"])
      params[name] = {
          "conv": {"weight": conv_w,
                   "bias": jnp.asarray(sd[f"{name}.conv.bias"])},
          "bn": {k: jnp.asarray(sd[f"{name}.bn.{k}"])
                 for k in ("weight", "bias", "running_mean",
                           "running_var")}}
    elif kind == "nb1d":
      p = {}
      for cname in ("conv3x1_1", "conv1x3_1", "conv3x1_2", "conv1x3_2"):
        p[cname] = {
            "weight": T.import_conv_weight(sd[f"{name}.{cname}.weight"]),
            "bias": jnp.asarray(sd[f"{name}.{cname}.bias"])}
      for bname in ("bn1", "bn2"):
        p[bname] = {k: jnp.asarray(sd[f"{name}.{bname}.{k}"])
                    for k in ("weight", "bias", "running_mean",
                              "running_var")}
      params[name] = p
    elif kind == "convT2":
      # decoder.output_conv is a bare ConvTranspose2d (ERFNet.py:121):
      # state_dict keys are <name>.weight / <name>.bias directly.
      params[name] = {"conv": {
          "weight": T.import_conv_transpose_weight(sd[f"{name}.weight"]),
          "bias": jnp.asarray(sd[f"{name}.bias"])}}
  return params
