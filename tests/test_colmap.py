"""COLMAP reader: synthesize binary/text models, read them back."""

import struct

import numpy as np
import pytest

from snerf_tpu.data import colmap


def write_cameras_bin(path, cams):
  with open(path, "wb") as f:
    f.write(struct.pack("<Q", len(cams)))
    for cid, (model_id, w, h, params) in cams.items():
      f.write(struct.pack("<iiQQ", cid, model_id, w, h))
      f.write(struct.pack(f"<{len(params)}d", *params))


def write_images_bin(path, imgs):
  with open(path, "wb") as f:
    f.write(struct.pack("<Q", len(imgs)))
    for iid, (q, t, cid, name) in imgs.items():
      f.write(struct.pack("<i", iid))
      f.write(struct.pack("<4d", *q))
      f.write(struct.pack("<3d", *t))
      f.write(struct.pack("<i", cid))
      f.write(name.encode() + b"\x00")
      f.write(struct.pack("<Q", 0))


def write_points_bin(path, pts):
  with open(path, "wb") as f:
    f.write(struct.pack("<Q", len(pts)))
    for i, (xyz, rgb, err) in enumerate(pts):
      f.write(struct.pack("<Q", i))
      f.write(struct.pack("<3d", *xyz))
      f.write(struct.pack("<3B", *rgb))
      f.write(struct.pack("<d", err))
      f.write(struct.pack("<Q", 0))


def test_binary_model_roundtrip(tmp_path):
  write_cameras_bin(tmp_path / "cameras.bin",
                    {1: (1, 640, 480, [500.0, 510.0, 320.0, 240.0])})
  q = [1.0, 0.0, 0.0, 0.0]  # identity
  write_images_bin(tmp_path / "images.bin",
                   {1: (q, [1.0, 2.0, 3.0], 1, "a.png"),
                    2: (q, [0.0, 0.0, 0.0], 1, "b.png")})
  write_points_bin(tmp_path / "points3D.bin",
                   [([0, 0, 5.0], [255, 0, 0], 0.5)])

  cams, imgs, pts = colmap.load_colmap_model(str(tmp_path))
  assert cams[1].model == "PINHOLE"
  K = cams[1].K()
  assert K[0, 0] == 500 and K[1, 1] == 510
  assert imgs[1].name == "a.png"
  # identity rotation, t = [1,2,3] -> c2w translation = -t
  np.testing.assert_allclose(imgs[1].c2w()[:3, 3], [-1, -2, -3],
                             atol=1e-9)
  xyz, rgb, err = pts
  np.testing.assert_allclose(xyz[0], [0, 0, 5])
  assert rgb[0, 0] == 255

  poses, Ks, names = colmap.colmap_to_poses(cams, imgs)
  assert names == ["a.png", "b.png"]
  assert poses.shape == (2, 3, 4)
  # axis flip: y/z columns negated vs identity
  np.testing.assert_allclose(poses[1, :, 1], [0, -1, 0], atol=1e-9)
  np.testing.assert_allclose(poses[1, :, 2], [0, 0, -1], atol=1e-9)


def test_text_model(tmp_path):
  (tmp_path / "cameras.txt").write_text(
      "# comment\n1 SIMPLE_PINHOLE 100 80 50.0 50.0 40.0\n")
  (tmp_path / "images.txt").write_text(
      "# comment\n1 1 0 0 0 0.5 0.5 0.5 1 img.png\n\n")
  cams, imgs, pts = colmap.load_colmap_model(str(tmp_path))
  assert cams[1].model == "SIMPLE_PINHOLE"
  assert cams[1].K()[0, 0] == 50.0
  assert imgs[1].camera_id == 1
  assert pts is None
