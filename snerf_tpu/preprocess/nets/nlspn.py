"""NLSPN-style depth completion — the reference's OTHER completer arm.

The YORO depth stage offers two interchangeable learned completers
(YORO_1CAM_PIPELINE_REFINE.py:706-724): NLSPN (`main.py --data_name
KITTIDC ... --pretrain ../results/model_00010.pt`, an external
NLSPN_ECCV20 checkout the reference shells out to but does NOT vendor)
and Sparse-Depth-Completion (the SDC arm, `preprocess/nets/sdc.py`,
architecture-exact with a tested checkpoint-import contract).

This module implements the NLSPN mechanism (Park et al., ECCV'20,
"Non-Local Spatial Propagation Network for Depth Completion") — the
part that distinguishes it from SDC's late-fusion regression:

  1. a backbone predicts an initial dense depth, per-pixel NON-LOCAL
     neighbor offsets (K fractional (dy, dx) displacements, not a fixed
     3x3 stencil), per-neighbor raw affinities, and an input-confidence
     map;
  2. affinities are normalized so sum_k |a_k| <= 1 (the paper's 'AS'
     affinity normalization; with non-negative affinities the update
     is convex — signed affinities trade that for expressiveness and
     rely on the fixed step count + training for stability);
  3. T propagation steps refine the depth:
       d <- (1 - sum_k a_k c_k) * d + sum_k a_k c_k * d[p + o_k]
     with each neighbor's contribution gated by the CONFIDENCE sampled
     at the neighbor location (the paper's confidence-incorporated
     affinity, eq. 8 — noisy measurements propagate less);
  4. measured sparse inputs are re-imposed each step weighted by their
     confidence (high-confidence returns anchor the solution, outliers
     — low confidence — may be overwritten).

Because the reference treats NLSPN as an external download (no vendored
source, no checkpoint in the repo), there is no state_dict layout to
import against — the backbone here is a compact in-repo encoder-decoder
(the SDC arm is the one with the 1:1 torch import contract). The
NLSPN-specific propagation math is what this arm contributes; it is
exposed behind the same `completion_fn` plug-in contract
(preprocess/pipeline.py) and evaluated head-to-head with SDC and
IP-Basic by scripts/eval_completion.py.

TPU notes: the non-local gather is a bilinear `map_coordinates` over
(K, H, W) coordinates — a dynamic gather, fine for the host-side
preprocessing stage this runs in (same placement as SDC/ERFNet); the
propagation loop is a fixed-length `lax.scan` (static shapes, jits
once).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from snerf_tpu.preprocess.nets import torchconv as T

K_NEIGHBORS = 8          # paper default (3x3 minus center)
PROP_STEPS = 6           # paper uses 18 at full scale; 6 suffices small
_MAX_OFFSET = 8.0        # clamp learned offsets (paper: unconstrained;
                         # bounded here for small training crops)

# the fixed 3x3-minus-center base stencil the learned offsets displace
_BASE = np.array([(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)
                  if not (dy == 0 and dx == 0)], np.float32)


def init_params(key, width=32):
  """Compact encoder-decoder backbone + NLSPN heads.

  Input NHWC [sparse_depth_m, r, g, b] (rgb in 0..255 like sdc.py).
  Heads: init depth (1) | offsets (2K) | affinity (K) | confidence (1).
  """
  w = width
  ks = jax.random.split(key, 12)
  p = {
      # encoder: /1 -> /2 -> /4
      "enc0": T.init_conv(ks[0], 4, w, 3),
      "enc1": T.init_conv(ks[1], w, w, 3),
      "enc2": T.init_conv(ks[2], w, 2 * w, 3),       # stride 2
      "enc3": T.init_conv(ks[3], 2 * w, 2 * w, 3),
      "enc4": T.init_conv(ks[4], 2 * w, 4 * w, 3),   # stride 2
      "enc5": T.init_conv(ks[5], 4 * w, 4 * w, 3),
      # decoder with skips: /4 -> /2 -> /1
      "dec2": T.init_conv(ks[6], 4 * w + 2 * w, 2 * w, 3),
      "dec1": T.init_conv(ks[7], 2 * w + w, w, 3),
      # heads
      "head_depth": T.init_conv(ks[8], w, 1, 3),
      "head_off": T.init_conv(ks[9], w, 2 * K_NEIGHBORS, 3),
      "head_aff": T.init_conv(ks[10], w, K_NEIGHBORS, 3),
      "head_conf": T.init_conv(ks[11], w, 1, 3),
  }
  # zero-init the offset head so training starts from the local 3x3
  # stencil (the paper's fixed-local SPN special case) and learns
  # non-locality gradually.
  p["head_off"]["weight"] = jnp.zeros_like(p["head_off"]["weight"])
  p["head_off"]["bias"] = jnp.zeros_like(p["head_off"]["bias"])
  return p


def _c(p, x, stride=1):
  return T.conv2d(x, p["weight"], p.get("bias"),
                  stride=(stride, stride), padding=(1, 1))


def _backbone(params, x):
  """x NHWC [depth, r, g, b] -> (d0, offsets, affinity, conf)."""
  e0 = T.relu(_c(params["enc0"], x))
  e0 = T.relu(_c(params["enc1"], e0))
  e1 = T.relu(_c(params["enc2"], e0, stride=2))
  e1 = T.relu(_c(params["enc3"], e1))
  e2 = T.relu(_c(params["enc4"], e1, stride=2))
  e2 = T.relu(_c(params["enc5"], e2))
  u1 = T.bilinear_resize(e2, e1.shape[1:3])
  d2 = T.relu(_c(params["dec2"], jnp.concatenate([u1, e1], -1)))
  u0 = T.bilinear_resize(d2, e0.shape[1:3])
  d1 = T.relu(_c(params["dec1"], jnp.concatenate([u0, e0], -1)))

  d0 = _c(params["head_depth"], d1)[..., 0]            # [N,H,W]
  off = _c(params["head_off"], d1)                     # [N,H,W,2K]
  off = _MAX_OFFSET * jnp.tanh(off / _MAX_OFFSET)
  aff = _c(params["head_aff"], d1)                     # [N,H,W,K]
  conf = jax.nn.sigmoid(_c(params["head_conf"], d1)[..., 0])
  return d0, off, aff, conf


def _normalize_affinity(aff):
  """Paper eq. 7: scale so sum_k |a_k| <= 1 (contraction guarantee)."""
  a = jnp.tanh(aff)
  denom = jnp.maximum(jnp.sum(jnp.abs(a), axis=-1, keepdims=True), 1.0)
  return a / denom


def _sample_at_neighbors(img, coords_y, coords_x):
  """Bilinear-sample img [H,W] at [K,H,W] fractional coords."""
  return jax.scipy.ndimage.map_coordinates(
      img, [coords_y, coords_x], order=1, mode="nearest")


def _propagate_one(d0, off, aff, conf, sparse, sparse_conf, steps):
  """Single-image NLSPN propagation (jit-/vmap-friendly).

  d0 [H,W] initial depth; off [H,W,2K]; aff [H,W,K] raw; conf [H,W];
  sparse [H,W] measured depth (0 where absent); sparse_conf [H,W]
  confidence at measured pixels (conf * validity).
  """
  H, W = d0.shape
  yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                        jnp.arange(W, dtype=jnp.float32), indexing="ij")
  base = jnp.asarray(_BASE)                          # [K,2]
  offk = off.reshape(H, W, K_NEIGHBORS, 2)
  ny = yy[None] + base[:, 0][:, None, None] \
      + jnp.transpose(offk[..., 0], (2, 0, 1))       # [K,H,W]
  nx = xx[None] + base[:, 1][:, None, None] \
      + jnp.transpose(offk[..., 1], (2, 0, 1))
  ny = jnp.clip(ny, 0.0, H - 1.0)
  nx = jnp.clip(nx, 0.0, W - 1.0)

  a = _normalize_affinity(aff)                       # [H,W,K]
  a = jnp.transpose(a, (2, 0, 1))                    # [K,H,W]
  # confidence-incorporated affinity (paper eq. 8): gate each neighbor
  # by the confidence AT the neighbor.
  c_nb = _sample_at_neighbors(conf, ny, nx)          # [K,H,W]
  ac = a * c_nb
  center = 1.0 - jnp.sum(ac, axis=0)                 # [H,W]

  has_meas = sparse_conf
  anchored = has_meas * sparse + (1.0 - has_meas) * d0

  def body(d, _):
    nb = _sample_at_neighbors(d, ny, nx)             # [K,H,W]
    d = center * d + jnp.sum(ac * nb, axis=0)
    # confidence-weighted re-imposition of measured inputs
    d = has_meas * sparse + (1.0 - has_meas) * d
    return d, None

  d, _ = jax.lax.scan(body, anchored, None, length=steps)
  return d


def apply(params, x, steps=PROP_STEPS):
  """x NHWC [sparse_depth_m, r*?, g, b] -> refined dense depth [N,H,W].

  The rgb channels follow sdc.py's convention (0..255 floats).
  """
  d0, off, aff, conf = _backbone(params, x)
  sparse = x[..., 0]
  valid = (sparse > 0.01).astype(jnp.float32)
  sparse_conf = conf * valid
  prop = jax.vmap(functools.partial(_propagate_one, steps=steps))
  return prop(d0, off, aff, conf, sparse, sparse_conf)


def train_completion(images, depths, steps=200, lr=1e-3, crop=64,
                     batch=2, seed=0, log_every=0, noise_std=0.0,
                     outlier_frac=0.0, scale_aug=0.0, width=32):
  """Same protocol as sdc.train_completion (shared eval harness):
  simulated lidar scanlines in, L1 on all valid GT out. The loss also
  supervises the pre-propagation init depth at 0.3 weight (the paper
  trains both) so the backbone cannot hide behind the propagation."""
  import optax

  from snerf_tpu.preprocess.nets.sdc import simulate_lidar_scanlines
  params = init_params(jax.random.PRNGKey(seed), width=width)
  tx = optax.chain(
      optax.clip_by_global_norm(1.0),
      optax.adam(optax.cosine_decay_schedule(lr, steps, alpha=0.1)))
  opt = tx.init(params)
  rng = np.random.RandomState(seed)
  N, H, W = depths.shape
  crop = min(crop, H, W)
  crop -= crop % 4

  @jax.jit
  def step(params, opt, x, gt, valid):
    def loss_fn(p):
      d0, off, aff, conf = _backbone(p, x)
      sparse = x[..., 0]
      v = (sparse > 0.01).astype(jnp.float32)
      prop = jax.vmap(functools.partial(_propagate_one,
                                        steps=PROP_STEPS))
      pred = prop(d0, off, aff, conf, sparse, conf * v)
      l_final = jnp.sum(jnp.abs(pred - gt) * valid) / (valid.sum() + 1e-6)
      l_init = jnp.sum(jnp.abs(d0 - gt) * valid) / (valid.sum() + 1e-6)
      return l_final + 0.3 * l_init
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
      print(f"[nlspn {s + 1}] loss={float(loss):.4f}", flush=True)
    losses.append(float(loss))
  return params, losses


def make_nlspn_completion_fn(params=None, weights_path=None,
                             pad_to: int = 4):
  """completion_fn(rgb u8 [H,W,3], sparse_depth_m f32 [H,W]) -> dense_m
  (preprocess/pipeline.py plug-in contract — interchangeable with
  make_sdc_completion_fn and default_completion_fn)."""
  if params is None:
    if weights_path is not None:
      data = np.load(weights_path)
      params = jax.tree_util.tree_unflatten(
          jax.tree_util.tree_structure(init_params(
              jax.random.PRNGKey(0))),
          [jnp.asarray(data[k]) for k in sorted(data.files)])
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
    out = np.asarray(fwd(params, jnp.asarray(x)))[0, :h, :w]
    out = np.maximum(out, 0.0)
    valid = sparse_depth > 0.1
    out[valid] = sparse_depth[valid]   # keep exact returns
    return out.astype(np.float32)

  return completion_fn
