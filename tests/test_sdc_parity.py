"""SDC uncertainty_net checkpoint import contract (VERDICT r2 missing #4).

Re-types the reference's Sparse-Depth-Completion/Models/model.py:13-174
structure in torch (including the convbn Sequential nesting that shapes
its state_dict key names), imports the random-init state_dict through
snerf_tpu.preprocess.nets.sdc, and asserts output parity — proving a
real SDC checkpoint ("mod.pth") loads correctly when supplied.
"""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from snerf_tpu.preprocess.nets import sdc
from tests.test_erfnet_parity import TNet, _randomize_bn_stats


def convbn(cin, cout, stride=1):
  return nn.Sequential(nn.Conv2d(cin, cout, 3, stride=stride, padding=1,
                                 bias=False))


class THourglass1(nn.Module):
  def __init__(self, c):
    super().__init__()
    self.conv1 = nn.Sequential(convbn(c, c, 2), nn.ReLU())
    self.conv2 = convbn(c, c)
    self.conv3 = nn.Sequential(convbn(c * 2, c * 2, 2), nn.ReLU())
    self.conv4 = nn.Sequential(convbn(c * 2, c * 2))
    self.conv5 = nn.Sequential(
        nn.ConvTranspose2d(c * 4, c * 2, 3, stride=2, padding=1,
                           output_padding=1, bias=False),
        nn.BatchNorm2d(c * 2), nn.ReLU())
    self.conv6 = nn.Sequential(
        nn.ConvTranspose2d(c * 2, c, 3, stride=2, padding=1,
                           output_padding=1, bias=False),
        nn.BatchNorm2d(c))

  def forward(self, x, em1, em2):
    x = self.conv1(x)
    x = F.relu(self.conv2(x))
    x = torch.cat((x, em1), 1)
    xp = self.conv3(x)
    xp = F.relu(self.conv4(xp))
    xp = torch.cat((xp, em2), 1)
    return self.conv6(self.conv5(xp)), x, xp


class THourglass2(nn.Module):
  def __init__(self, c):
    super().__init__()
    self.conv1 = nn.Sequential(convbn(c, c * 2, 2),
                               nn.BatchNorm2d(c * 2), nn.ReLU())
    self.conv2 = convbn(c * 2, c * 2)
    self.conv3 = nn.Sequential(convbn(c * 2, c * 2, 2),
                               nn.BatchNorm2d(c * 2), nn.ReLU())
    self.conv4 = nn.Sequential(convbn(c * 2, c * 4))
    self.conv5 = nn.Sequential(
        nn.ConvTranspose2d(c * 4, c * 2, 3, stride=2, padding=1,
                           output_padding=1, bias=False),
        nn.BatchNorm2d(c * 2), nn.ReLU())
    self.conv6 = nn.Sequential(
        nn.ConvTranspose2d(c * 2, c, 3, stride=2, padding=1,
                           output_padding=1, bias=False),
        nn.BatchNorm2d(c))

  def forward(self, x, em1, em2):
    x = self.conv1(x)
    x = F.relu(self.conv2(x) + em1)
    xp = self.conv3(x)
    xp = F.relu(self.conv4(xp) + em2)
    return self.conv6(self.conv5(xp))


class TUncertaintyNet(nn.Module):
  def __init__(self):
    super().__init__()
    self.depthnet = TNet(4, 3)
    self.convbnrelu = nn.Sequential(convbn(2, 32), nn.ReLU())
    self.hourglass1 = THourglass1(32)
    self.hourglass2 = THourglass2(32)
    self.fuse = nn.Sequential(convbn(32, 32), nn.ReLU(),
                              nn.Conv2d(32, 2, 3, padding=1, bias=True))

  def forward(self, x):
    lidar = x[:, 0:1]
    emb0, em1, em2 = self.depthnet(x)
    gf, pd, conf = emb0[:, 0:1], emb0[:, 1:2], emb0[:, 2:3]
    h = self.convbnrelu(torch.cat((lidar, gf), 1))
    out1, em3, em4 = self.hourglass1(h, em1, em2)
    out1 = out1 + h
    out2 = self.hourglass2(out1, em3, em4) + h
    f = self.fuse(out2)
    ld, lc = torch.chunk(f, 2, dim=1)
    lc, conf = torch.chunk(torch.softmax(torch.cat((lc, conf), 1), 1),
                           2, dim=1)
    return conf * pd + lc * ld


def test_sdc_import_parity():
  torch.manual_seed(0)
  net = TUncertaintyNet().eval()
  with torch.no_grad():
    _randomize_bn_stats(net)
  x = torch.randn(1, 4, 32, 48)
  x[:, 0] = torch.relu(x[:, 0]) * 20.0    # lidar meters
  x[:, 1:] = (x[:, 1:] + 1) * 100.0       # rgb*255-ish
  with torch.no_grad():
    ref = net(x)
  params = sdc.import_state_dict(net.state_dict())
  xj = np.transpose(x.numpy(), (0, 2, 3, 1))
  out = sdc.apply(params, xj)
  np.testing.assert_allclose(
      np.transpose(np.asarray(out), (0, 3, 1, 2)), ref.numpy(),
      atol=5e-3, rtol=1e-4)


def test_sdc_completion_fn_contract():
  fn = sdc.make_sdc_completion_fn()    # random-init weights
  rgb = np.random.RandomState(0).randint(0, 255, (30, 44, 3), np.uint8)
  sparse = np.zeros((30, 44), np.float32)
  sparse[::5, ::7] = 12.0
  out = fn(rgb, sparse)
  assert out.shape == (30, 44) and out.dtype == np.float32
  assert np.isfinite(out).all() and (out >= 0).all()
  assert out[0, 0] == sparse[0, 0]     # exact returns preserved


def test_sdc_train_completion_smoke():
  """In-repo training loop drives the loss down on tiny synthetic data
  (full quality table: scripts/eval_completion.py -> PERF.md)."""
  rng = np.random.RandomState(0)
  images = rng.randint(0, 255, (2, 48, 64, 3), np.uint8)
  yy = np.mgrid[0:48, 0:64][0].astype(np.float32)
  depths = np.stack([5.0 + 0.05 * yy, 8.0 - 0.04 * yy])
  params, losses = sdc.train_completion(images, depths, steps=6,
                                        lr=1e-3, crop=48, batch=1)
  assert np.isfinite(losses).all()
  assert losses[-1] < losses[0] * 1.5   # no blow-up


def test_simulate_lidar_scanlines():
  rng = np.random.RandomState(0)
  d = np.full((40, 60), 7.0, np.float32)
  s = sdc.simulate_lidar_scanlines(d, rng)
  frac = (s > 0).mean()
  assert 0.03 < frac < 0.3, frac
  assert (s[s > 0] == 7.0).all()
