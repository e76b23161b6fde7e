"""RAFT-lite learned optical flow (flax) — correlation volume +
iterative ConvGRU updates with semi-global cost aggregation.

Capability target: the reference's SepFlow external
(scripts/depth_model/external/SeparableFlow-main/core/sepflow.py:1-259,
corr.py:1-241, update.py:1-150 + 4.3k LoC GANet CUDA): a learned flow
net for the YORO flow-vs-lidar consistency check (YORO:441-500,540-625),
where the classical pyramidal-LK default (preprocess/flow.py) is weak at
motion boundaries. The architecture is the RAFT/SepFlow class — feature
encoder -> all-pairs correlation pyramid -> recurrent lookups+updates —
with the GANet-style semi-global aggregation reused from
preprocess/aggregation.py (sga) on the motion features, SepFlow's
signature move re-expressed with the repo's own lax.scan machinery.

Runs offline (preprocessing), so gather-based correlation lookups are
fine on TPU/CPU (SURVEY §2.6.2 blesses non-hot-path lax implementations).
"""

from __future__ import annotations

import os
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from snerf_tpu.preprocess.aggregation import sga

_LEVELS = 4        # correlation pyramid levels (level 3 covers +-24 px
                   # full-res from the current estimate — large shifts)
_RADIUS = 3        # lookup window radius -> (2r+1)^2 taps per level


_HE = nn.initializers.he_normal()


class _Encoder(nn.Module):
  """Shared conv trunk to 1/4 resolution.

  He init throughout: flax's default lecun init halves activation
  variance at every ReLU, which shrinks the correlation values to
  ~1e-2 after 5 layers — the GRU then learns to ignore them and
  predicts the mean (zero) flow (the round-3 eval's failure mode)."""
  out_dim: int = 96

  @nn.compact
  def __call__(self, x):
    x = nn.relu(nn.Conv(32, (3, 3), strides=2, kernel_init=_HE)(x))
    x = nn.relu(nn.Conv(32, (3, 3), kernel_init=_HE)(x))
    x = nn.relu(nn.Conv(64, (3, 3), strides=2, kernel_init=_HE)(x))
    x = nn.relu(nn.Conv(64, (3, 3), kernel_init=_HE)(x))
    return nn.Conv(self.out_dim, (3, 3), kernel_init=_HE)(x)


class _ConvGRU(nn.Module):
  hidden: int = 64

  @nn.compact
  def __call__(self, h, x):
    hx = jnp.concatenate([h, x], axis=-1)
    z = nn.sigmoid(nn.Conv(self.hidden, (3, 3))(hx))
    r = nn.sigmoid(nn.Conv(self.hidden, (3, 3))(hx))
    q = nn.tanh(nn.Conv(self.hidden, (3, 3))(
        jnp.concatenate([r * h, x], axis=-1)))
    return (1 - z) * h + z * q


def _corr_pyramid(f0, f1):
  """All-pairs correlation [h, w, h1, w1] + avg-pooled pyramid."""
  c = f0.shape[-1]
  corr = jnp.einsum("ijc,klc->ijkl", f0, f1) / jnp.sqrt(float(c))
  pyr = [corr]
  for _ in range(_LEVELS - 1):
    h, w, h1, w1 = pyr[-1].shape
    if h1 % 2 or w1 % 2:
      # feature map not divisible by 2^(LEVELS-1); callers should pad
      # inputs to a multiple of 4*2^(LEVELS-1)=32 px (pad_to below) so
      # checkpointed conv shapes (which depend on len(pyr)) stay fixed
      break
    p = pyr[-1].reshape(h, w, h1 // 2, 2, w1 // 2, 2).mean((3, 5))
    pyr.append(p)
  return pyr


def _bilinear_grid(vol, ys, xs):
  """vol [h, w, h1, w1]; ys/xs [h, w, K] float coords into (h1, w1) ->
  [h, w, K]."""
  h1, w1 = vol.shape[2], vol.shape[3]
  y0 = jnp.floor(ys)
  x0 = jnp.floor(xs)
  wy = ys - y0
  wx = xs - x0
  out = 0.0
  for dy in (0, 1):
    for dx in (0, 1):
      yy = jnp.clip(y0 + dy, 0, h1 - 1).astype(jnp.int32)
      xx = jnp.clip(x0 + dx, 0, w1 - 1).astype(jnp.int32)
      w = (wy if dy else 1 - wy) * (wx if dx else 1 - wx)
      out = out + w * jnp.take_along_axis(
          vol.reshape(*vol.shape[:2], -1),
          (yy * w1 + xx), axis=-1)
  return out


def _lookup(pyr, flow):
  """Sample each pyramid level in a (2r+1)^2 window around the flow
  target; returns [h, w, LEVELS*(2r+1)^2]."""
  h, w = flow.shape[:2]
  ii, jj = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                        jnp.arange(w, dtype=jnp.float32), indexing="ij")
  d = jnp.arange(-_RADIUS, _RADIUS + 1, dtype=jnp.float32)
  dyy, dxx = jnp.meshgrid(d, d, indexing="ij")
  dyy = dyy.reshape(-1)
  dxx = dxx.reshape(-1)
  outs = []
  for l, vol in enumerate(pyr):
    cy = (ii + flow[..., 1]) / (2 ** l)
    cx = (jj + flow[..., 0]) / (2 ** l)
    ys = cy[..., None] + dyy
    xs = cx[..., None] + dxx
    outs.append(_bilinear_grid(vol, ys, xs))
  return jnp.concatenate(outs, axis=-1)


class RaftLite(nn.Module):
  """iters unrolled statically; __call__(img0, img1) -> list of [H, W, 2]
  flow predictions (coarse-to-converged), full resolution, (dx, dy)."""
  iters: int = 8
  hidden: int = 64

  @nn.compact
  def __call__(self, img0, img1):
    f = _Encoder(out_dim=96, name="fnet")

    def inorm(x):
      # instance-norm the correlation features (RAFT's encoder ends in
      # instance norm): keeps corr magnitudes O(1) regardless of depth
      mu = x.mean(axis=(0, 1), keepdims=True)
      var = ((x - mu) ** 2).mean(axis=(0, 1), keepdims=True)
      return (x - mu) * jax.lax.rsqrt(var + 1e-5)

    f0 = inorm(f(img0[None])[0])
    f1 = inorm(f(img1[None])[0])
    ctx = _Encoder(out_dim=self.hidden + 64, name="cnet")(img0[None])[0]
    h = nn.tanh(ctx[..., :self.hidden])
    context = nn.relu(ctx[..., self.hidden:])

    # SGA guidance from context (aggregation.py sga: [B, 4, 2, H, W]
    # (g0, g1) pairs) — the SepFlow-style semi-global smoothing of the
    # motion features.
    g = nn.Conv(4, (3, 3), name="sga_guidance")(context[None])  # [1,h,w,4]
    g1 = nn.sigmoid(g) * 0.8
    guidance = jnp.stack([1.0 - g1, g1], axis=-1)   # [1, h, w, 4, 2]
    guidance = jnp.transpose(guidance, (0, 3, 4, 1, 2))

    pyr = _corr_pyramid(f0, f1)
    gru = _ConvGRU(hidden=self.hidden, name="gru")
    motion_conv = nn.Conv(96, (3, 3), name="motion_conv",
                          kernel_init=_HE)
    flow_conv = nn.Conv(32, (3, 3), name="flow_conv", kernel_init=_HE)
    motion_mix = nn.Conv(80, (3, 3), name="motion_mix", kernel_init=_HE)
    flow_head0 = nn.Conv(96, (3, 3), name="flow_head0", kernel_init=_HE)
    flow_head1 = nn.Conv(2, (3, 3), name="flow_head1")

    hq, wq = f0.shape[:2]
    flow = jnp.zeros((hq, wq, 2), jnp.float32)
    preds = []
    for _ in range(self.iters):
      corr = _lookup(pyr, jax.lax.stop_gradient(flow))
      mf = nn.relu(motion_conv(corr))
      ff = nn.relu(flow_conv(flow))
      m = nn.relu(motion_mix(jnp.concatenate([mf, ff], axis=-1)))
      # semi-global aggregation over the motion features (NCHW for sga)
      m_sga = sga(jnp.transpose(m[None], (0, 3, 1, 2)), guidance)
      m = jnp.transpose(m_sga, (0, 2, 3, 1))[0]
      x = jnp.concatenate([m, flow, context], axis=-1)
      h = gru(h, x)
      delta = flow_head1(nn.relu(flow_head0(h)))
      flow = flow + delta
      full = 4.0 * jax.image.resize(
          flow, (4 * hq, 4 * wq, 2), method="bilinear")
      preds.append(full[:img0.shape[0], :img0.shape[1]])
    return preds


# ---------------------------------------------------------------------------
# training on synthetic warps + the flow_fn plug-in contract
# ---------------------------------------------------------------------------


def synthetic_pair(rng: np.random.RandomState, size=(64, 64),
                   max_shift=6.0, sigma=None):
  """Random smooth texture warped by affine + sinusoidal displacement;
  returns (img0, img1, gt_flow) with img* [H, W, 1] in [0, 1].

  sigma: texture smoothness; None draws from [1.0, 2.5] so the net
  generalizes across feature scales (a fixed 1.5 trains a net that
  fails on the smoother eval fixtures)."""
  from scipy.ndimage import gaussian_filter, map_coordinates
  H, W = size
  if sigma is None:
    sigma = rng.uniform(1.0, 2.5)
  img0 = gaussian_filter(rng.rand(H, W).astype(np.float32), sigma)
  img0 = (img0 - img0.min()) / max(float(np.ptp(img0)), 1e-6)
  # contrast/brightness jitter (eval images need not span [0, 1])
  img0 = img0 * rng.uniform(0.5, 1.0) + rng.uniform(0.0, 0.3)
  yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
  cy, cx = (H - 1) / 2, (W - 1) / 2
  ang = rng.uniform(-0.06, 0.06)
  sc = rng.uniform(0.96, 1.04)
  tx, ty = rng.uniform(-max_shift, max_shift, 2)
  ca, sa = sc * np.cos(ang), sc * np.sin(ang)
  gx = (ca * (xx - cx) - sa * (yy - cy) + cx + tx) - xx
  gy = (sa * (xx - cx) + ca * (yy - cy) + cy + ty) - yy
  # low-frequency sinusoidal component
  fy, fx = rng.uniform(0.5, 2.0, 2)
  ph = rng.uniform(0, 2 * np.pi, 2)
  gx = gx + rng.uniform(0, 1.5) * np.sin(
      2 * np.pi * fy * yy / H + ph[0])
  gy = gy + rng.uniform(0, 1.5) * np.sin(
      2 * np.pi * fx * xx / W + ph[1])
  # img1 sampled so that img1(x + flow) == img0(x): invert by sampling
  # img0 at the backward map of the forward flow (small-warp inverse).
  img1 = map_coordinates(img0, [yy - gy, xx - gx], order=1,
                         mode="nearest")
  valid = np.ones((H, W), np.float32)
  if rng.rand() < 0.3:
    # static occluder pasted into img1: flow under it is undefined
    # (masked from the loss); teaches motion-boundary robustness.
    oh = rng.randint(H // 8, H // 3)
    ow = rng.randint(W // 8, W // 3)
    oy = rng.randint(0, H - oh)
    ox = rng.randint(0, W - ow)
    img1[oy:oy + oh, ox:ox + ow] = rng.uniform(0.2, 0.8)
    valid[oy:oy + oh, ox:ox + ow] = 0.0
  return (img0[..., None], img1[..., None],
          np.stack([gx, gy], -1).astype(np.float32), valid)


def sequence_loss(preds: Sequence[jnp.ndarray], gt, gamma=0.8,
                  valid=None):
  n = len(preds)
  loss = 0.0
  for i, p in enumerate(preds):
    e = jnp.abs(p - gt)
    if valid is not None:
      e = e * valid[..., None]
      m = jnp.sum(e) / (jnp.sum(valid) * 2 + 1e-6)
    else:
      m = jnp.mean(e)
    loss = loss + gamma ** (n - 1 - i) * m
  return loss


def train_raftlite(steps: int = 400, size=(64, 64), lr=3e-4, seed=0,
                   iters: int = 6, batch: int = 4, log_every: int = 0,
                   max_shift: float = 0.0):
  """Train on synthetic warps; returns (model, params, losses).

  Batched pairs (vmap) + cosine lr decay + a shift curriculum (small
  warps first) — single-pair constant-lr training oscillates without
  converging (the learned-flow eval's original failure mode)."""
  import optax
  model = RaftLite(iters=iters)
  rng = np.random.RandomState(seed)
  i0, i1, gt, _ = synthetic_pair(rng, size)
  params = model.init(jax.random.PRNGKey(seed), jnp.asarray(i0),
                      jnp.asarray(i1))["params"]
  # RAFT's own recipe clips gradients at 1.0 — the GRU unroll produces
  # occasional large-norm grads that otherwise wreck Adam's moments.
  tx = optax.chain(
      optax.clip_by_global_norm(1.0),
      optax.adam(optax.cosine_decay_schedule(lr, steps, alpha=0.05)))
  opt = tx.init(params)

  batched = jax.vmap(lambda p, a, b: model.apply({"params": p}, a, b),
                     in_axes=(None, 0, 0))

  @jax.jit
  def step(params, opt, i0, i1, gt, valid):
    def loss_fn(p):
      preds = batched(p, i0, i1)
      return sequence_loss(preds, gt, valid=valid)
    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt = tx.update(grads, opt, params)
    return optax.apply_updates(params, updates), opt, loss

  if not max_shift:
    max_shift = min(size) * 0.22  # level-3 lookups reach ~24 px full-res
  losses = []
  for s in range(steps):
    # curriculum: max shift 1.5 -> max over the first 60% of training
    ms = 1.5 + (max_shift - 1.5) * min(1.0, s / max(1, int(0.6 * steps)))
    triples = [synthetic_pair(rng, size, max_shift=ms)
               for _ in range(batch)]
    i0 = jnp.asarray(np.stack([t[0] for t in triples]))
    i1 = jnp.asarray(np.stack([t[1] for t in triples]))
    gt = jnp.asarray(np.stack([t[2] for t in triples]))
    valid = jnp.asarray(np.stack([t[3] for t in triples]))
    params, opt, loss = step(params, opt, i0, i1, gt, valid)
    if log_every and (s + 1) % log_every == 0:
      print(f"[raftlite {s + 1}] loss={float(loss):.4f}", flush=True)
    losses.append(float(loss))
  return model, params, losses


def save_params(path: str, params):
  flat = jax.tree_util.tree_flatten_with_path(params)[0]
  np.savez(path, **{jax.tree_util.keystr(k): np.asarray(v)
                    for k, v in flat})


def load_params(path: str, template):
  data = dict(np.load(path))
  flat, treedef = jax.tree_util.tree_flatten_with_path(template)
  # packaged weights are stored float16 (half the repo bytes); compute
  # stays f32
  leaves = [jnp.asarray(data[jax.tree_util.keystr(k)], dtype=jnp.float32)
            for k, _ in flat]
  return jax.tree_util.tree_unflatten(treedef, leaves)


# f16 weights trained in-repo on synthetic warps (scripts/eval_flow.py
# --steps 5000); used by make_raftlite_flow_fn when no params are given.
PACKAGED_WEIGHTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "weights", "raftlite.npz")


def make_raftlite_flow_fn(params=None, weights_path=None, iters: int = 8,
                          pad_to: int = 32, tile: int = 0,
                          tile_overlap: int = 64):
  """flow_fn(img0 u8 [H,W,3], img1) -> [H, W, 2] float32 (dx, dy) px —
  the pipeline plug-in contract (preprocess/pipeline.py:12).

  tile > 0 enables tiled inference for full-frame inputs: the all-pairs
  correlation volume is O((HW/16)^2) memory (a 900x1600 nuScenes frame
  would need ~32 GB at 1/4 res), so frames larger than `tile` are
  processed as overlapping `tile`x`tile` crops whose flows are blended
  with a separable linear feather. Valid as long as the true flow
  magnitude stays under `tile_overlap` (the net's lookup pyramid only
  reaches +-24 px anyway — SepFlow-class preprocessing flow, not
  arbitrary-displacement flow). One XLA compile total: every crop has
  the same static shape."""
  model = RaftLite(iters=iters)
  if params is None:
    z = jnp.zeros((32, 32, 1))
    template = model.init(jax.random.PRNGKey(0), z, z)["params"]
    if weights_path is None and os.path.exists(PACKAGED_WEIGHTS):
      weights_path = PACKAGED_WEIGHTS
    if weights_path is not None:
      params = load_params(weights_path, template)
    else:
      params = template

  def _gray(img):
    img = np.asarray(img, np.float32)
    if img.ndim == 3:
      img = img.mean(-1)
    if img.max() > 1.5:
      img = img / 255.0
    return img[..., None]

  fwd = jax.jit(lambda p, a, b: model.apply({"params": p}, a, b)[-1])

  def _feather(n: int, lo_edge: bool, hi_edge: bool) -> np.ndarray:
    # linear ramp over the overlap band; frame-boundary edges stay 1 so
    # the first/last tiles own their borders fully
    wgt = np.ones(n, np.float32)
    ramp = np.linspace(1.0 / (tile_overlap + 1), 1.0, tile_overlap,
                       dtype=np.float32)
    if not lo_edge:
      wgt[:tile_overlap] = ramp
    if not hi_edge:
      wgt[n - tile_overlap:] = ramp[::-1]
    return wgt

  def flow_fn(img0, img1):
    g0 = _gray(img0)
    g1 = _gray(img1)
    h, w = g0.shape[:2]
    if tile and max(h, w) > tile:
      t = -(-tile // pad_to) * pad_to          # static crop size
      stride = t - tile_overlap
      hp = max(t - h, 0)
      wp = max(t - w, 0)
      p0 = np.pad(g0, ((0, hp), (0, wp), (0, 0)), mode="edge")
      p1 = np.pad(g1, ((0, hp), (0, wp), (0, 0)), mode="edge")
      H, W = p0.shape[:2]
      ys = list(range(0, max(H - t, 0) + 1, stride))
      xs = list(range(0, max(W - t, 0) + 1, stride))
      if ys[-1] + t < H:
        ys.append(H - t)                       # flush-fit final row/col
      if xs[-1] + t < W:
        xs.append(W - t)
      acc = np.zeros((H, W, 2), np.float32)
      den = np.zeros((H, W, 1), np.float32)
      for y in ys:
        for x in xs:
          out = np.asarray(fwd(params,
                               jnp.asarray(p0[y:y + t, x:x + t]),
                               jnp.asarray(p1[y:y + t, x:x + t])))
          wy = _feather(t, y == ys[0], y == ys[-1])
          wx = _feather(t, x == xs[0], x == xs[-1])
          wgt = (wy[:, None] * wx[None, :])[..., None]
          acc[y:y + t, x:x + t] += out * wgt
          den[y:y + t, x:x + t] += wgt
      return (acc / np.maximum(den, 1e-8))[:h, :w].astype(np.float32)
    hp = -h % pad_to
    wp = -w % pad_to
    g0 = np.pad(g0, ((0, hp), (0, wp), (0, 0)), mode="edge")
    g1 = np.pad(g1, ((0, hp), (0, wp), (0, 0)), mode="edge")
    out = np.asarray(fwd(params, jnp.asarray(g0), jnp.asarray(g1)))
    return out[:h, :w].astype(np.float32)

  return flow_fn
