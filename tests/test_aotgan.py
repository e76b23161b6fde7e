"""AOT-GAN inpainter: checkpoint-import contract + pipeline plug-in
(VERDICT r3 missing #3 / next #6).

Re-types the public AOT-GAN InpaintGenerator in torch (the layout the
reference's downloaded `inpaint` package serves for lama_or_AOT=1,
stage2_code/inpainting_fig.py:14-96), imports a random-init state_dict
through snerf_tpu.preprocess.nets.aotgan, and asserts output parity —
proving a real released AOT-GAN checkpoint loads correctly. Plus the
sim-pipeline plug-in contract and the in-repo training smoke.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from snerf_tpu.preprocess.nets import aotgan

DIM, BLOCKS, RATES = 32, 2, (1, 2, 4, 8)


def my_layer_norm(feat):
  mean = feat.mean((2, 3), keepdim=True)
  std = feat.std((2, 3), keepdim=True) + 1e-9
  feat = 2 * (feat - mean) / std - 1
  return 5 * feat


class TAOTBlock(nn.Module):
  def __init__(self, dim, rates):
    super().__init__()
    self.rates = rates
    for i, rate in enumerate(rates):
      self.__setattr__(
          "block{}".format(str(i).zfill(2)),
          nn.Sequential(nn.ReflectionPad2d(rate),
                        nn.Conv2d(dim, dim // 4, 3, padding=0,
                                  dilation=rate),
                        nn.ReLU(True)))
    self.fuse = nn.Sequential(nn.ReflectionPad2d(1),
                              nn.Conv2d(dim, dim, 3, padding=0,
                                        dilation=1))
    self.gate = nn.Sequential(nn.ReflectionPad2d(1),
                              nn.Conv2d(dim, dim, 3, padding=0,
                                        dilation=1))

  def forward(self, x):
    out = torch.cat(
        [self.__getattr__(f"block{str(i).zfill(2)}")(x)
         for i in range(len(self.rates))], 1)
    out = self.fuse(out)
    mask = my_layer_norm(self.gate(x))
    mask = torch.sigmoid(mask)
    return x * (1 - mask) + out * mask


class TUpConv(nn.Module):
  def __init__(self, inc, outc):
    super().__init__()
    self.conv = nn.Conv2d(inc, outc, 3, stride=1, padding=1)

  def forward(self, x):
    return self.conv(F.interpolate(x, scale_factor=2, mode="bilinear",
                                   align_corners=True))


class TInpaintGenerator(nn.Module):
  def __init__(self, dim=DIM, blocks=BLOCKS, rates=RATES):
    super().__init__()
    self.encoder = nn.Sequential(
        nn.ReflectionPad2d(3), nn.Conv2d(4, dim // 4, 7), nn.ReLU(True),
        nn.Conv2d(dim // 4, dim // 2, 4, stride=2, padding=1),
        nn.ReLU(True),
        nn.Conv2d(dim // 2, dim, 4, stride=2, padding=1), nn.ReLU(True))
    self.middle = nn.Sequential(
        *[TAOTBlock(dim, rates) for _ in range(blocks)])
    self.decoder = nn.Sequential(
        TUpConv(dim, dim // 2), nn.ReLU(True),
        TUpConv(dim // 2, dim // 4), nn.ReLU(True),
        nn.Conv2d(dim // 4, 3, 3, stride=1, padding=1))

  def forward(self, x):
    x = self.encoder(x)
    x = self.middle(x)
    x = self.decoder(x)
    return torch.tanh(x)


def test_torch_import_output_parity():
  torch.manual_seed(0)
  tnet = TInpaintGenerator().eval()
  params = aotgan.import_state_dict(tnet.state_dict())

  rng = np.random.RandomState(1)
  x = rng.rand(1, 4, 48, 64).astype(np.float32) * 2 - 1
  with torch.no_grad():
    ref = tnet(torch.from_numpy(x)).numpy()
  out = np.asarray(aotgan.generator(
      params, np.transpose(x, (0, 2, 3, 1))))
  assert np.max(np.abs(np.transpose(out, (0, 3, 1, 2)) - ref)) < 1e-4


def test_import_rejects_wrong_layout():
  torch.manual_seed(0)
  sd = TInpaintGenerator().state_dict()
  sd["middle.9.unexpected.1.weight"] = torch.zeros(4, 4, 3, 3)
  with pytest.raises(ValueError, match="mismatch"):
    aotgan.import_state_dict(sd)


def test_inpaint_fn_contract():
  """Pipeline plug-in: context untouched, hole filled, u8 scale."""
  import jax
  p = aotgan.init_params(jax.random.PRNGKey(0), dim=32, blocks=2)
  fn = aotgan.make_inpaint_fn(params=p)
  rng = np.random.RandomState(0)
  rgb = (rng.rand(30, 46, 3) * 255).astype(np.float32)
  mask = np.zeros((30, 46), bool)
  mask[10:18, 12:30] = True
  out = fn(rgb, mask)
  assert out.shape == rgb.shape
  assert np.abs(out[~mask] - rgb[~mask]).max() < 1e-2
  assert out.min() >= 0 and out.max() <= 255


def test_train_inpainter_learns():
  """A few steps of the in-repo loop must reduce the hole loss on a
  structured image set (sanity, not quality — quality is measured by
  scripts/eval_inpaint.py against Telea)."""
  rng = np.random.RandomState(0)
  yy, xx = np.mgrid[0:48, 0:48].astype(np.float32)
  imgs = []
  for k in range(4):
    im = (np.stack([np.sin(xx / (3 + k)) * 0.5 + 0.5,
                    np.cos(yy / (4 + k)) * 0.5 + 0.5,
                    ((xx + yy) % 17) / 17], -1) * 255)
    imgs.append(im.astype(np.uint8))
  params, losses = aotgan.train_inpainter(
      np.stack(imgs), steps=220, crop=32, batch=4, dim=16, blocks=1,
      lr=1e-3, seed=0)
  assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.8


def test_auto_inpaint_default_uses_learned_band_arm():
  """inpaint_arm='auto' (sim/pipeline.py) resolves to the packaged
  AOT-GAN for the compose band call site (the arm that wins band masks
  by +6 dB held-out, scripts/eval_inpaint.py) and still satisfies the
  plug-in contract; with weights unavailable it falls back to Telea."""
  from snerf_tpu.sim import pipeline as P
  fn = P.auto_inpaint_fn()
  assert fn is not P.default_inpaint_fn  # packaged weights exist here
  rng = np.random.RandomState(0)
  rgb = rng.rand(24, 32, 3).astype(np.float32)
  mask = np.zeros((24, 32), bool)
  mask[8:12, 10:20] = True
  out = fn(rgb, mask)
  assert out.shape == rgb.shape
  assert np.abs(np.asarray(out)[~mask] - rgb[~mask]).max() < 1e-2
