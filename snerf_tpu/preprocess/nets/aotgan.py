"""AOT-GAN inpainting generator — the learned stage-2 inpainter.

The reference's simulation pipeline inpaints paste-boundary bands and
relight masks with a pretrained LaMa-or-AOT model it downloads as an
`inpaint` package (s-nerfpp/stage2_code/inpainting_fig.py:14-96,
`for_simnerf.choose_model_inpaint(..., lama_or_AOT=...)`); the package
is not vendored in the repo. This module types the public AOT-GAN
generator layout (Zeng et al., "Aggregated Contextual Transformations
for High-Resolution Image Inpainting") so a real released AOT-GAN
checkpoint (`G0000000.pt`-style state_dict) imports key-exactly —
mirroring the tested VGG/SDC weight contracts — and a compact in-repo
trained configuration ships as the default learned arm.

Layout (torch state_dict keys in comments):
  encoder:  ReflectionPad(3) > Conv 4->64 k7 (encoder.1) > ReLU
            > Conv 64->128 k4 s2 p1 (encoder.3) > ReLU
            > Conv 128->256 k4 s2 p1 (encoder.5) > ReLU
  middle:   N x AOTBlock(dim, rates):
              block0i: ReflectionPad(r_i) > Conv dim->dim/len(rates)
                       k3 dil r_i (middle.{n}.block0{i}.1) > ReLU
              fuse:    ReflectionPad(1) > Conv dim->dim k3
                       (middle.{n}.fuse.1)
              gate:    ReflectionPad(1) > Conv dim->dim k3
                       (middle.{n}.gate.1)
              out = x*(1-sig(norm(gate))) + fuse(cat(blocks))*sig(...)
  decoder:  UpConv 256->128 (decoder.0.conv) > ReLU
            > UpConv 128->64 (decoder.2.conv) > ReLU
            > Conv 64->3 k3 p1 (decoder.4) ; tanh
UpConv = bilinear x2 (align_corners) then conv k3 p1.

Inference contract (their test-time composition): images in [-1, 1],
holes whitened (masked = img*(1-m) + m), generator input cat(masked,
mask), output composited back outside the hole.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from snerf_tpu.preprocess.nets import torchconv as T

# compact in-repo configuration (trained by train_inpainter); the
# import contract supports the full released size (dim=256, blocks=8).
RATES = (1, 2, 4, 8)
DEFAULT_DIM = 64
DEFAULT_BLOCKS = 4

PACKAGED_WEIGHTS = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "weights", "aotgan.npz")


def init_params(key, dim: int = DEFAULT_DIM,
                blocks: int = DEFAULT_BLOCKS, rates=RATES):
  ks = iter(jax.random.split(key, 8 + blocks * (len(rates) + 2)))
  e1 = dim // 4
  e2 = dim // 2
  p = {
      "encoder.1": T.init_conv(next(ks), 4, e1, 7, bias=True),
      "encoder.3": T.init_conv(next(ks), e1, e2, 4, bias=True),
      "encoder.5": T.init_conv(next(ks), e2, dim, 4, bias=True),
  }
  for n in range(blocks):
    for i, _ in enumerate(rates):
      p[f"middle.{n}.block0{i}.1"] = T.init_conv(
          next(ks), dim, dim // len(rates), 3, bias=True)
    p[f"middle.{n}.fuse.1"] = T.init_conv(next(ks), dim, dim, 3,
                                          bias=True)
    p[f"middle.{n}.gate.1"] = T.init_conv(next(ks), dim, dim, 3,
                                          bias=True)
  p["decoder.0.conv"] = T.init_conv(next(ks), dim, e2, 3, bias=True)
  p["decoder.2.conv"] = T.init_conv(next(ks), e2, e1, 3, bias=True)
  p["decoder.4"] = T.init_conv(next(ks), e1, 3, 3, bias=True)
  return p


def _shape_cfg(params):
  """(dim, blocks, rates) from a params dict (import or packaged)."""
  dim = params["encoder.5"]["weight"].shape[-1]
  blocks = 1 + max(int(k.split(".")[1]) for k in params
                   if k.startswith("middle."))
  nrates = 1 + max(int(k.split(".")[2][-1]) for k in params
                   if ".block0" in k)
  return dim, blocks, RATES[:nrates]


def _refl_pad(x, r):
  return jnp.pad(x, ((0, 0), (r, r), (r, r), (0, 0)), mode="reflect")


def _conv(x, p, stride=1, dilation=1):
  return T.conv2d(x, p["weight"], p.get("bias"),
                  stride=(stride, stride), padding=(0, 0),
                  dilation=(dilation, dilation))


def _interp_matrix(n_in, n_out):
  """1D linear-interpolation matrix with torch align_corners=True
  sampling (src = i*(n_in-1)/(n_out-1))."""
  src = np.arange(n_out) * (n_in - 1) / (n_out - 1)
  lo = np.floor(src).astype(np.int64)
  hi = np.minimum(lo + 1, n_in - 1)
  f = src - lo
  M = np.zeros((n_out, n_in), np.float32)
  M[np.arange(n_out), lo] += 1.0 - f
  M[np.arange(n_out), hi] += f
  return jnp.asarray(M)


def _upsample2_bilinear(x):
  """torch F.interpolate(scale_factor=2, mode='bilinear',
  align_corners=True) — separable matmul form (MXU-friendly and
  bit-matching torch's corner-aligned sampling, which
  jax.image.resize's half-pixel convention is not)."""
  n, h, w, c = x.shape
  My = _interp_matrix(h, 2 * h)
  Mx = _interp_matrix(w, 2 * w)
  y = jnp.einsum("Oh,nhwc->nOwc", My, x)
  return jnp.einsum("Ow,nhwc->nhOc", Mx, y)


def _my_layer_norm(feat):
  """AOT gate normalization: per-sample per-channel spatial norm with
  torch's unbiased std, then 5*(2*z - 1)."""
  mean = feat.mean(axis=(1, 2), keepdims=True)
  n = feat.shape[1] * feat.shape[2]
  var = ((feat - mean) ** 2).sum(axis=(1, 2), keepdims=True) / (n - 1)
  std = jnp.sqrt(var) + 1e-9
  return 5.0 * (2.0 * (feat - mean) / std - 1.0)


def generator(params, x):
  """x [N, H, W, 4] (masked image [-1,1] + mask) -> rgb [-1,1]."""
  dim, blocks, rates = _shape_cfg(params)
  h = T.relu(_conv(_refl_pad(x, 3), params["encoder.1"]))
  h = T.relu(T.conv2d(h, params["encoder.3"]["weight"],
                      params["encoder.3"].get("bias"),
                      stride=(2, 2), padding=(1, 1)))
  h = T.relu(T.conv2d(h, params["encoder.5"]["weight"],
                      params["encoder.5"].get("bias"),
                      stride=(2, 2), padding=(1, 1)))
  for bid in range(blocks):
    outs = [T.relu(_conv(_refl_pad(h, r),
                         params[f"middle.{bid}.block0{i}.1"],
                         dilation=r))
            for i, r in enumerate(rates)]
    out = _conv(_refl_pad(jnp.concatenate(outs, -1), 1),
                params[f"middle.{bid}.fuse.1"])
    gate = _conv(_refl_pad(h, 1), params[f"middle.{bid}.gate.1"])
    g = jax.nn.sigmoid(_my_layer_norm(gate))
    h = h * (1.0 - g) + out * g
  h = T.relu(T.conv2d(_upsample2_bilinear(h),
                      params["decoder.0.conv"]["weight"],
                      params["decoder.0.conv"].get("bias"),
                      padding=(1, 1)))
  h = T.relu(T.conv2d(_upsample2_bilinear(h),
                      params["decoder.2.conv"]["weight"],
                      params["decoder.2.conv"].get("bias"),
                      padding=(1, 1)))
  h = T.conv2d(h, params["decoder.4"]["weight"],
               params["decoder.4"].get("bias"), padding=(1, 1))
  return jnp.tanh(h)


def apply(params, image01, mask):
  """Inpaint: image01 [N,H,W,3] in [0,1], mask [N,H,W] bool/0-1 holes.

  Returns the composited image in [0,1] (hole replaced, context
  untouched) — the test-time composition of the public AOT-GAN repo.
  """
  img = image01 * 2.0 - 1.0
  m = mask[..., None].astype(img.dtype)
  masked = img * (1.0 - m) + m     # whiten holes
  pred = generator(params, jnp.concatenate([masked, m], -1))
  comp = img * (1.0 - m) + pred * m
  return (comp + 1.0) / 2.0


def import_state_dict(sd):
  """Map a torch AOT-GAN generator state_dict 1:1 into the params dict.

  Accepts the released checkpoints' flat keys ('encoder.1.weight', ...)
  with optional 'module.'/'netG.'/'generator.' prefixes stripped.
  """
  clean = {}
  for k, v in sd.items():
    for pre in ("module.", "netG.", "generator."):
      if k.startswith(pre):
        k = k[len(pre):]
    clean[k] = np.asarray(v)
  params = {}
  names = sorted({k.rsplit(".", 1)[0] for k in clean
                  if k.endswith((".weight", ".bias"))})
  for name in names:
    w = clean[name + ".weight"]
    entry = {"weight": T.import_conv_weight(w)}
    if name + ".bias" in clean:
      entry["bias"] = clean[name + ".bias"].astype(np.float32)
    params[name] = entry
  # validate the layout (key-exact contract)
  dim, blocks, rates = _shape_cfg(params)
  expect = {"encoder.1", "encoder.3", "encoder.5",
            "decoder.0.conv", "decoder.2.conv", "decoder.4"}
  for n in range(blocks):
    expect |= {f"middle.{n}.block0{i}.1" for i in range(len(rates))}
    expect |= {f"middle.{n}.fuse.1", f"middle.{n}.gate.1"}
  missing = expect - set(params)
  extra = set(params) - expect
  if missing or extra:
    raise ValueError(f"AOT-GAN state_dict mismatch: missing {missing}, "
                     f"unexpected {extra}")
  return params


def save_params(path, params):
  flat = {}
  for name, entry in params.items():
    for leaf, v in entry.items():
      flat[f"{name}|{leaf}"] = np.asarray(v, np.float16)
  np.savez(path, **flat)


def load_params(path):
  data = np.load(path)
  params = {}
  for k in data.files:
    name, leaf = k.split("|")
    params.setdefault(name, {})[leaf] = jnp.asarray(data[k],
                                                    jnp.float32)
  return params


def _random_band_mask(rng, H, W):
  """Hole masks matching the pipeline's real use: thin paste-boundary
  bands (dilate XOR erode of a blob, sim/compose.py:155) and dilated
  vehicle-ish rectangles (relight pass)."""
  m = np.zeros((H, W), np.float32)
  kind = rng.randint(3)
  if kind == 0:      # boundary band around an ellipse
    cy, cx = rng.randint(H // 4, 3 * H // 4), rng.randint(W // 4,
                                                          3 * W // 4)
    ry, rx = rng.randint(6, H // 3), rng.randint(6, W // 3)
    yy, xx = np.mgrid[0:H, 0:W]
    d = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2
    band = rng.uniform(0.15, 0.5)
    m[(d > 1.0 - band) & (d < 1.0 + band)] = 1.0
  elif kind == 1:    # rectangle (relight-style)
    h = rng.randint(H // 8, H // 3)
    w = rng.randint(W // 8, W // 3)
    y0, x0 = rng.randint(0, H - h), rng.randint(0, W - w)
    m[y0:y0 + h, x0:x0 + w] = 1.0
  else:              # a few random strokes
    for _ in range(rng.randint(2, 5)):
      y, x = rng.randint(H), rng.randint(W)
      t = rng.randint(2, 5)
      L = rng.randint(10, max(H, W) // 2)
      ang = rng.uniform(0, np.pi)
      for s in range(L):
        yy = int(y + s * np.sin(ang))
        xx = int(x + s * np.cos(ang))
        if 0 <= yy < H and 0 <= xx < W:
          m[max(0, yy - t):yy + t, max(0, xx - t):xx + t] = 1.0
  return m


def train_inpainter(images, steps=1500, crop=64, batch=8, lr=2e-4,
                    dim=DEFAULT_DIM, blocks=DEFAULT_BLOCKS, seed=0,
                    log_every=0):
  """Train the compact generator on hole reconstruction over `images`
  (u8 [N, H, W, 3]). L1 loss, hole pixels weighted 6x (the AOT-GAN
  recipe's L1 term; the adversarial/style terms need external data and
  are omitted for the in-repo arm). Returns (params, losses)."""
  import optax
  params = init_params(jax.random.PRNGKey(seed), dim=dim, blocks=blocks)
  tx = optax.adam(optax.cosine_decay_schedule(lr, steps, alpha=0.1))
  opt = tx.init(params)
  rng = np.random.RandomState(seed)
  N, H, W = images.shape[:3]
  crop = min(crop, H, W)
  crop -= crop % 4

  @jax.jit
  def step(params, opt, img, mask):
    def loss_fn(p):
      out = apply(p, img, mask)
      w = 1.0 + 5.0 * mask[..., None]
      return jnp.sum(jnp.abs(out - img) * w) / jnp.sum(w)
    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt = tx.update(grads, opt, params)
    return optax.apply_updates(params, updates), opt, loss

  losses = []
  for s in range(steps):
    ib, mb = [], []
    for _ in range(batch):
      i = rng.randint(N)
      y0 = rng.randint(0, H - crop + 1)
      x0 = rng.randint(0, W - crop + 1)
      patch = images[i, y0:y0 + crop, x0:x0 + crop] \
          .astype(np.float32) / 255.0
      if rng.rand() < 0.5:     # horizontal flip (the only street-safe
        patch = patch[:, ::-1]  # geometric aug at this data scale)
      ib.append(patch)
      mb.append(_random_band_mask(rng, crop, crop))
    params, opt, loss = step(params, opt,
                             jnp.asarray(np.stack(ib)),
                             jnp.asarray(np.stack(mb)))
    losses.append(float(loss))
    if log_every and (s + 1) % log_every == 0:
      print(f"[aotgan {s + 1}] loss={np.mean(losses[-log_every:]):.4f}",
            flush=True)
  return params, losses


def make_inpaint_fn(params=None, weights_path=None, pad_to: int = 4):
  """Pipeline plug-in: inpaint_fn(rgb [H,W,3] float 0-255 or 0-1, mask
  [H,W] bool) -> rgb, matching sim/pipeline.py's contract. Loads the
  packaged in-repo weights when none are given; a real AOT-GAN
  checkpoint goes through weights_path (.pt/.pth via import contract,
  .npz via save_params)."""
  if params is None:
    path = weights_path or PACKAGED_WEIGHTS
    if path.endswith(".npz"):
      params = load_params(path)
    else:
      params = import_state_dict(T.load_state_dict_file(path))

  def inpaint_fn(rgb, mask):
    rgb = np.asarray(rgb, np.float32)
    scale = 255.0 if rgb.max() > 1.5 else 1.0
    x = rgb / scale
    H, W = x.shape[:2]
    ph = (-H) % pad_to
    pw = (-W) % pad_to
    xp = np.pad(x, ((0, ph), (0, pw), (0, 0)), mode="reflect")
    mp = np.pad(np.asarray(mask, np.float32), ((0, ph), (0, pw)))
    out = np.asarray(apply(params, jnp.asarray(xp)[None],
                           jnp.asarray(mp)[None])[0])
    return np.clip(out[:H, :W] * scale, 0, scale)

  return inpaint_fn
