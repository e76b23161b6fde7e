"""Sparse-Depth-Completion `uncertainty_net` — exact architecture parity
with the reference's Models/model.py:13-174 (global ERFNet + hourglass
local net + confidence late fusion), in JAX.

This is the learned depth-completion stage of the YORO pipeline
(YORO_1CAM_PIPELINE_REFINE.py:711-729), replacing the classical IP-Basic
default (preprocess/pipeline.default_completion_fn) when weights are
supplied — or when the compact in-repo training loop (train_completion
in segtrain.py style) has produced them.

Parameter dict keys mirror the torch state_dict exactly (including the
reference's convbn Sequential nesting quirks: convbn returns
Sequential(Conv2d) so keys look like "hourglass1.conv2.0.weight" and
"fuse.0.0.weight"). Input convention matches Test/test.py defaults
(normal=False): channels [lidar_depth_m, r*255, g*255, b*255].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from snerf_tpu.preprocess.nets import erfnet
from snerf_tpu.preprocess.nets import torchconv as T

IN_CHANNELS = 4
_GLOBAL_OUT = 3   # [global_features, precise_depth, conf] (model.py:22)


def _conv_def(cin, cout, stride=1, bias=False):
  return dict(cin=cin, cout=cout, stride=stride, bias=bias)


def init_params(key):
  ks = jax.random.split(key, 24)
  p = {"depthnet": erfnet.init_params(ks[0], IN_CHANNELS, _GLOBAL_OUT)}
  i = 1

  def conv(cin, cout, ksize=3, bias=False):
    nonlocal i
    out = T.init_conv(ks[i], cin, cout, ksize, bias=bias)
    i += 1
    return out

  p["convbnrelu"] = {"conv": conv(2, 32)}
  p["hourglass1"] = {
      "conv1": {"conv": conv(32, 32)},
      "conv2": {"conv": conv(32, 32)},
      "conv3": {"conv": conv(64, 64)},
      "conv4": {"conv": conv(64, 64)},
      "conv5": {"conv": conv(128, 64), "bn": T.init_bn(64)},
      "conv6": {"conv": conv(64, 32), "bn": T.init_bn(32)}}
  p["hourglass2"] = {
      "conv1": {"conv": conv(32, 64), "bn": T.init_bn(64)},
      "conv2": {"conv": conv(64, 64)},
      "conv3": {"conv": conv(64, 64), "bn": T.init_bn(64)},
      "conv4": {"conv": conv(64, 128)},
      "conv5": {"conv": conv(128, 64), "bn": T.init_bn(64)},
      "conv6": {"conv": conv(64, 32), "bn": T.init_bn(32)}}
  p["fuse"] = {"conv0": conv(32, 32), "conv2": conv(32, 2, bias=True)}
  return p


def _c(p, x, stride=1, padding=1):
  return T.conv2d(x, p["weight"], p.get("bias"), stride=(stride, stride),
                  padding=(padding, padding))


def _ct(p, x):
  return T.conv_transpose2d(x, p["weight"], p.get("bias"), stride=2,
                            kernel_size=3, padding=1, output_padding=1)


def _hourglass1(p, x, em1, em2):
  """model.py:88-120."""
  x = T.relu(_c(p["conv1"]["conv"], x, stride=2))
  x = _c(p["conv2"]["conv"], x)
  x = T.relu(x)
  x = jnp.concatenate([x, em1], axis=-1)
  xp = T.relu(_c(p["conv3"]["conv"], x, stride=2))
  xp = _c(p["conv4"]["conv"], xp)
  xp = T.relu(xp)
  xp = jnp.concatenate([xp, em2], axis=-1)
  out = T.relu(T.batchnorm(_ct(p["conv5"]["conv"], xp), p["conv5"]["bn"],
                           eps=1e-5))
  out = T.batchnorm(_ct(p["conv6"]["conv"], out), p["conv6"]["bn"],
                    eps=1e-5)
  return out, x, xp


def _hourglass2(p, x, em1, em2):
  """model.py:123-161."""
  x = T.relu(T.batchnorm(_c(p["conv1"]["conv"], x, stride=2),
                         p["conv1"]["bn"], eps=1e-5))
  x = _c(p["conv2"]["conv"], x)
  x = T.relu(x + em1)
  xp = T.relu(T.batchnorm(_c(p["conv3"]["conv"], x, stride=2),
                          p["conv3"]["bn"], eps=1e-5))
  xp = _c(p["conv4"]["conv"], xp)
  xp = T.relu(xp + em2)
  out = T.relu(T.batchnorm(_ct(p["conv5"]["conv"], xp), p["conv5"]["bn"],
                           eps=1e-5))
  out = T.batchnorm(_ct(p["conv6"]["conv"], out), p["conv6"]["bn"],
                    eps=1e-5)
  return out


def apply(params, x):
  """x NHWC [lidar_m, r*255, g*255, b*255] -> dense depth (meters), NHW1.

  Mirrors uncertainty_net.forward (model.py:37-77)."""
  lidar_in = x[..., 0:1]
  emb0, em1, em2 = erfnet.apply(params["depthnet"], x, IN_CHANNELS,
                                _GLOBAL_OUT, return_embeddings=True)
  global_features = emb0[..., 0:1]
  precise_depth = emb0[..., 1:2]
  conf = emb0[..., 2:3]

  h = jnp.concatenate([lidar_in, global_features], axis=-1)
  h = T.relu(_c(params["convbnrelu"]["conv"], h))
  out1, em3, em4 = _hourglass1(params["hourglass1"], h, em1, em2)
  out1 = out1 + h
  out2 = _hourglass2(params["hourglass2"], out1, em3, em4)
  out2 = out2 + h
  f = T.relu(_c(params["fuse"]["conv0"], out2))
  f = _c(params["fuse"]["conv2"], f)

  lidar_to_depth, lidar_to_conf = f[..., 0:1], f[..., 1:2]
  w = jax.nn.softmax(jnp.concatenate([lidar_to_conf, conf], axis=-1),
                     axis=-1)
  return w[..., 1:2] * precise_depth + w[..., 0:1] * lidar_to_depth


def import_state_dict(sd):
  """torch uncertainty_net.state_dict() -> params (names per model.py)."""
  sd = T.state_dict_to_numpy(sd)
  p = {"depthnet": erfnet.import_state_dict(sd, IN_CHANNELS, _GLOBAL_OUT,
                                            prefix="depthnet.")}

  def conv(name):
    out = {"weight": T.import_conv_weight(sd[f"{name}.weight"])}
    if f"{name}.bias" in sd:
      out["bias"] = jnp.asarray(sd[f"{name}.bias"])
    return out

  def convt(name):
    out = {"weight": T.import_conv_transpose_weight(sd[f"{name}.weight"])}
    if f"{name}.bias" in sd:
      out["bias"] = jnp.asarray(sd[f"{name}.bias"])
    return out

  def bn(name):
    return {k: jnp.asarray(sd[f"{name}.{k}"])
            for k in ("weight", "bias", "running_mean", "running_var")}

  p["convbnrelu"] = {"conv": conv("convbnrelu.0.0")}
  p["hourglass1"] = {
      "conv1": {"conv": conv("hourglass1.conv1.0.0")},
      "conv2": {"conv": conv("hourglass1.conv2.0")},
      "conv3": {"conv": conv("hourglass1.conv3.0.0")},
      "conv4": {"conv": conv("hourglass1.conv4.0.0")},
      "conv5": {"conv": convt("hourglass1.conv5.0"),
                "bn": bn("hourglass1.conv5.1")},
      "conv6": {"conv": convt("hourglass1.conv6.0"),
                "bn": bn("hourglass1.conv6.1")}}
  p["hourglass2"] = {
      "conv1": {"conv": conv("hourglass2.conv1.0.0"),
                "bn": bn("hourglass2.conv1.1")},
      "conv2": {"conv": conv("hourglass2.conv2.0")},
      "conv3": {"conv": conv("hourglass2.conv3.0.0"),
                "bn": bn("hourglass2.conv3.1")},
      "conv4": {"conv": conv("hourglass2.conv4.0.0")},
      "conv5": {"conv": convt("hourglass2.conv5.0"),
                "bn": bn("hourglass2.conv5.1")},
      "conv6": {"conv": convt("hourglass2.conv6.0"),
                "bn": bn("hourglass2.conv6.1")}}
  p["fuse"] = {"conv0": conv("fuse.0.0"), "conv2": conv("fuse.2")}
  return p


def simulate_lidar_scanlines(depth, rng, n_lines=12, jitter=2,
                             noise_std=0.0, outlier_frac=0.0):
  """Sparse scanline samples of a dense depth map (lidar-like rows).

  noise_std (m) + outlier_frac model real lidar reprojection: range
  noise plus occasional gross errors from motion/calibration misalign
  (the failure mode the YORO flow-vs-lidar consistency check exists
  for, YORO:540-625) — the regime where a learned completer earns its
  keep over classical interpolation."""
  H, W = depth.shape
  sparse = np.zeros_like(depth)
  rows = np.linspace(4, H - 5, n_lines).astype(int)
  rows = np.clip(rows + rng.randint(-jitter, jitter + 1, rows.shape),
                 0, H - 1)
  for r in rows:
    cols = rng.choice(W, size=max(4, W // 3), replace=False)
    sparse[r, cols] = depth[r, cols]
  hit = sparse > 0
  if noise_std > 0:
    sparse[hit] += rng.randn(int(hit.sum())).astype(depth.dtype) \
        * noise_std
  if outlier_frac > 0:
    out = hit & (rng.rand(H, W) < outlier_frac)
    n = int(out.sum())
    if n:
      sparse[out] = rng.uniform(depth[depth > 0].min(),
                                depth.max(), n).astype(depth.dtype)
  return np.maximum(sparse, 0.0) * hit


def train_completion(images, depths, steps=200, lr=1e-3, crop=64,
                     batch=2, seed=0, log_every=0,
                     noise_std=0.0, outlier_frac=0.0,
                     scale_aug=0.0):
  """Fit the uncertainty_net to (rgb u8 [N,H,W,3], dense depth_m
  [N,H,W]) with simulated lidar-scanline inputs + L1 loss on all valid
  ground truth. Returns (params, losses)."""
  import optax
  params = init_params(jax.random.PRNGKey(seed))
  tx = optax.chain(
      optax.clip_by_global_norm(1.0),
      optax.adam(optax.cosine_decay_schedule(lr, steps, alpha=0.1)))
  opt = tx.init(params)
  rng = np.random.RandomState(seed)
  N, H, W = depths.shape
  crop = min(crop, H, W)
  crop -= crop % 8

  @jax.jit
  def step(params, opt, x, gt, valid):
    def loss_fn(p):
      pred = apply(p, x)[..., 0]
      return jnp.sum(jnp.abs(pred - gt) * valid) / (valid.sum() + 1e-6)
    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt = tx.update(grads, opt, params)
    return optax.apply_updates(params, updates), opt, loss

  losses = []
  for s in range(steps):
    xb, gb, vb = [], [], []
    for _ in range(batch):
      i = rng.randint(N)
      y0 = rng.randint(0, H - crop + 1)
      x0 = rng.randint(0, W - crop + 1)
      d = depths[i, y0:y0 + crop, x0:x0 + crop]
      if scale_aug > 0:
        # random global depth scale: RGB is scale-ambiguous, so the
        # net must anchor absolute depth on the lidar channel instead
        # of learning the synthetic-scene RGB->depth shortcut.
        d = d * np.exp(rng.uniform(-scale_aug, scale_aug))
      rgbc = images[i, y0:y0 + crop, x0:x0 + crop].astype(np.float32)
      sparse = simulate_lidar_scanlines(d, rng, noise_std=noise_std,
                                        outlier_frac=outlier_frac)
      xb.append(np.concatenate([sparse[..., None], rgbc], axis=-1))
      gb.append(d)
      vb.append((d > 0.01).astype(np.float32))
    params, opt, loss = step(params, opt,
                             jnp.asarray(np.stack(xb), jnp.float32),
                             jnp.asarray(np.stack(gb), jnp.float32),
                             jnp.asarray(np.stack(vb), jnp.float32))
    if log_every and (s + 1) % log_every == 0:
      print(f"[sdc {s + 1}] loss={float(loss):.4f}", flush=True)
    losses.append(float(loss))
  return params, losses


# ---------------------------------------------------------------------------
# plug-in contract (preprocess/pipeline.py completion_fn)
# ---------------------------------------------------------------------------


def make_sdc_completion_fn(weights_path=None, params=None,
                           pad_to: int = 8):
  """completion_fn(rgb u8 [H,W,3], sparse_depth_m f32 [H,W]) -> dense_m.

  With neither weights_path nor params, random-init weights are used —
  callers wanting a sane default without a checkpoint should keep
  pipeline.default_completion_fn (IP-Basic) instead.
  """
  if params is None:
    if weights_path is not None:
      params = import_state_dict(T.load_state_dict_file(weights_path))
    else:
      params = init_params(jax.random.PRNGKey(0))
  fwd = jax.jit(apply)

  def completion_fn(rgb, sparse_depth):
    h, w = sparse_depth.shape
    hp = -h % pad_to
    wp = -w % pad_to
    x = np.concatenate(
        [sparse_depth[..., None].astype(np.float32),
         rgb.astype(np.float32)], axis=-1)[None]
    x = np.pad(x, ((0, 0), (0, hp), (0, wp), (0, 0)), mode="edge")
    out = np.asarray(fwd(params, jnp.asarray(x)))[0, :h, :w, 0]
    out = np.maximum(out, 0.0)
    valid = sparse_depth > 0.1
    out[valid] = sparse_depth[valid]  # keep exact returns (pipeline.py)
    return out.astype(np.float32)

  return completion_fn
