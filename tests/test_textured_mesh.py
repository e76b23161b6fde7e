"""Textured + animated mesh assets (VERDICT r1 missing #5):
OBJ vt/mtl loading with seam splitting, bilinear texture sampling,
textured rasterization, asset-bank layouts, sim e2e with a textured
asset."""

import numpy as np
import pytest

from snerf_tpu.sim import compose
from snerf_tpu.sim.mesh import (
    AssetBank, load_obj_asset, sample_texture, save_obj,
    save_obj_textured)


def checker_texture(n=32):
  t = ((np.arange(n)[:, None] // 4 + np.arange(n)[None] // 4) % 2
       ).astype(np.float32)
  return np.stack([t, 1 - t, np.full_like(t, 0.5)], axis=-1)


def textured_quad():
  # quad in the xy plane at z=0 spanning [-1, 1]^2, uv = corners
  verts = np.array([[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]],
                   np.float32)
  faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
  uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
  return verts, faces, uvs


def test_obj_textured_roundtrip(tmp_path):
  verts, faces, uvs, tex = *textured_quad(), checker_texture()
  p = str(tmp_path / "quad.obj")
  save_obj_textured(p, verts, faces, uvs, tex)
  a = load_obj_asset(p)
  assert a.texture is not None and a.texture.shape == tex.shape
  np.testing.assert_allclose(a.texture, tex, atol=1 / 255)
  assert a.uvs is not None and a.uvs.shape[0] == a.verts.shape[0]
  np.testing.assert_allclose(a.verts[a.faces].reshape(-1, 3),
                             verts[faces].reshape(-1, 3))


def test_obj_uv_seam_split(tmp_path):
  """One vertex shared by faces with DIFFERENT vt indices must be
  duplicated so per-vertex uvs stay exact."""
  p = tmp_path / "seam.obj"
  p.write_text(
      "v 0 0 0\nv 1 0 0\nv 0 1 0\n"
      "vt 0 0\nvt 1 0\nvt 0 1\nvt 1 1\n"
      "f 1/1 2/2 3/3\n"
      "f 1/4 2/2 3/3\n")  # vertex 1 reused with vt 4
  a = load_obj_asset(str(p))
  assert a.verts.shape[0] == 4  # vertex 1 split into two
  assert a.uvs.shape[0] == 4


def test_sample_texture_bilinear():
  tex = np.zeros((4, 4, 3), np.float32)
  tex[0, :, 0] = 1.0  # top image row = red; uv v=1 maps to image top
  top = sample_texture(tex, np.array([[0.5, 0.999]]))
  bottom = sample_texture(tex, np.array([[0.5, 0.001]]))
  assert top[0, 0] > 0.9
  assert bottom[0, 0] < 0.1


def test_rasterize_textured_quad():
  verts, faces, uvs = textured_quad()
  tex = checker_texture()
  inst = compose.Instance(verts=verts, faces=faces, colors=None,
                          uvs=uvs, texture=tex,
                          position=np.zeros(3), yaw_deg=0)
  # camera looking down from z=5
  w2c = np.eye(4)
  R = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1.0]])
  w2c[:3, :3] = R.T
  w2c[:3, 3] = -R.T @ np.array([0, 0, 5.0])
  K = np.array([[60.0, 0, 32], [0, 60.0, 32], [0, 0, 1]])
  rgb, depth, mask = compose.render_instance(inst, w2c[:3, :4], K,
                                             (64, 64))
  assert mask.sum() > 200
  # the checker pattern must appear: both red-ish and green-ish pixels
  on = rgb[mask]
  assert (on[:, 0] > 0.7).any() and (on[:, 1] > 0.7).any()
  # depth ~5 over the quad
  assert np.allclose(depth[mask], 5.0, atol=0.05)


def test_asset_bank_layouts_and_sequences(tmp_path):
  verts, faces, uvs = textured_quad()
  tex = checker_texture()
  # TEXTure layout: <root>/vehicle/car0/mesh/mesh.obj
  d = tmp_path / "vehicle" / "car0" / "mesh"
  d.mkdir(parents=True)
  save_obj_textured(str(d / "mesh.obj"), verts, faces, uvs, tex)
  # animated person sequence: <root>/person/p0/walkobj/00{0,1}.obj
  pd = tmp_path / "person" / "p0" / "walkobj"
  pd.mkdir(parents=True)
  save_obj(str(pd / "000.obj"), verts, faces)
  save_obj(str(pd / "001.obj"), verts + np.array([0, 0, 0.1],
                                                 np.float32), faces)
  bank = AssetBank(str(tmp_path))
  rng = np.random.RandomState(0)
  a = bank.sample_asset("vehicle", rng)
  assert a.texture is not None and a.uvs is not None
  seq = bank.sample_sequence(rng, "person")
  assert len(seq) == 2
  assert seq[0].verts.shape == seq[1].verts.shape
  # consistent normalization across frames (same scale/center applied)
  assert not np.allclose(seq[0].verts, seq[1].verts)


def test_sim_compose_with_textured_instance():
  verts, faces, uvs = textured_quad()
  # lift the quad 1m above ground so it pastes over the background
  verts = verts + np.array([0, 0, 1.0], np.float32)
  tex = checker_texture()
  inst = compose.Instance(verts=verts, faces=faces, colors=None,
                          uvs=uvs, texture=tex,
                          position=np.zeros(3), yaw_deg=30.0)
  w2c = np.eye(4)
  R = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1.0]])
  w2c[:3, :3] = R.T
  w2c[:3, 3] = -R.T @ np.array([0, 0, 6.0])
  K = np.array([[60.0, 0, 32], [0, 60.0, 32], [0, 0, 1]])
  bg_rgb = np.zeros((64, 64, 3), np.float32)
  bg_depth = np.full((64, 64), 7.0, np.float32)
  out = compose.compose_view(bg_rgb, bg_depth, None, [inst],
                             w2c[:3, :4], K)
  m = out["masks"][0]
  assert m.any()
  assert out["rgb"][m].max() > 0.5
  assert out["bboxes"][0]["truncated"] == pytest.approx(0.0, abs=1e-6)
