"""nuScenes scene extraction -> S-NeRF training layout.

Behavioral parity target (re-derived): reference
scripts/nuscenes_preprocess.py:22-154 — walk 6 cameras x N sweeps,
c2w = ego2global @ cam2ego, recenter on the middle frame, rotate into its
frame, flip axes to the LLFF-like [down, right, back] column order the
loader expects, emit images/ + poses_bounds.npy (n x 19) + token.json +
channel_tokens.json.

The nuScenes devkit walk is behind `extract_scene` (requires
nuscenes-devkit + raw data); the pose math is pure numpy and unit-tested
via `build_poses_bounds`.
"""

from __future__ import annotations

import json
import os
from typing import Sequence

import numpy as np

SENSORS = ["CAM_FRONT", "CAM_FRONT_LEFT", "CAM_FRONT_RIGHT",
           "CAM_BACK", "CAM_BACK_LEFT", "CAM_BACK_RIGHT"]


def compose_c2w(ego2global, cam2ego):
  """c2w = ego2global @ cam2ego (nuscenes_preprocess.py:95-96)."""
  return np.asarray(ego2global) @ np.asarray(cam2ego)


def recenter_on_middle(camtoworlds):
  """Recenter translations on the middle frame and rotate into its frame
  (nuscenes_preprocess.py:97-108)."""
  camtoworlds = np.asarray(camtoworlds)
  mid = camtoworlds[len(camtoworlds) // 2].copy()
  c2w = camtoworlds.copy()
  c2w[:, :3, 3] = camtoworlds[:, :3, 3] - mid[:3, 3]
  c2w[:, :3, 3] = c2w[:, :3, 3] @ mid[:3, :3]
  c2w[:, :3, :3] = np.moveaxis(
      np.dot(np.linalg.inv(mid[:3, :3]), c2w[:, :3, :3]), 1, 0)
  return c2w


def build_poses_bounds(camtoworlds, intrinsics, hw,
                       close_depth: float = 1.0,
                       inf_depth: float = 999.9) -> np.ndarray:
  """(recentered c2w [N,4,4], K [N,3,3], (H, W)) -> poses_bounds [N, 19].

  Column layout (nuscenes_preprocess.py:110-151): 3x5 block of
  [row-swapped pose | (cx+0.5, cy+0.5, f)] after the axis flip
  [r0,r1,r2] -> [r1, r0, -r2], then bounds, then (H, W).
  """
  c2w = recenter_on_middle(camtoworlds)
  K = np.asarray(intrinsics)
  H, W = hw

  poses = c2w[:, :3, :4].transpose([1, 2, 0])       # [3, 4, N]
  cx = K[:, 0, 2] + 0.5
  cy = K[:, 1, 2] + 0.5
  f = K[:, 0, 0]
  cam_k = np.stack([cx, cy, f], axis=0)              # [3, N]
  poses = np.concatenate([poses, cam_k[:, None, :]], 1)  # [3, 5, N]
  poses = np.concatenate(
      [poses[:, 1:2], poses[:, 0:1], -poses[:, 2:3],
       poses[:, 3:4], poses[:, 4:5]], 1)

  rows = []
  for i in range(poses.shape[-1]):
    rows.append(np.concatenate(
        [poses[..., i].ravel(), [close_depth, inf_depth], [H, W]], 0))
  return np.stack(rows).astype(np.float64)


def extract_scene(nusc, scene_token: str, savedir: str,
                  skip: int = 20, total_num: int = 40,
                  camera_index: Sequence[int] = (0, 1, 2, 3, 4, 5),
                  hw=(900, 1600)):
  """Walk the devkit records and write the training layout
  (requires nuscenes-devkit; the pure math above is devkit-free)."""
  try:
    from pyquaternion import Quaternion
  except ImportError as e:
    raise ImportError("nuscenes extraction needs pyquaternion/devkit") \
        from e
  import shutil

  sensors = [SENSORS[i] for i in camera_index]
  scene = nusc.get("scene", scene_token)
  sample = nusc.get("sample", scene["first_sample_token"])
  for _ in range(skip):
    sample = nusc.get("sample", sample["next"])

  img_paths, c2ws, Ks = [], [], []
  sample_idx_list, channel_tokens = {}, {s: [] for s in sensors}
  idx = 0
  for s in sensors:
    data = nusc.get("sample_data", sample["data"][s])
    for _ in range(total_num):
      path, _, K = nusc.get_sample_data(data["token"])
      channel_tokens[s].append(data["token"])
      if data["is_key_frame"]:
        sample_idx_list[idx] = data["token"]
      idx += 1
      img_paths.append(path)
      Ks.append(np.asarray(K, np.float32))
      ego = nusc.get("ego_pose", data["ego_pose_token"])
      cal = nusc.get("calibrated_sensor", data["calibrated_sensor_token"])
      e2g = np.eye(4)
      e2g[:3, :3] = Quaternion(ego["rotation"]).rotation_matrix
      e2g[:3, 3] = ego["translation"]
      c2e = np.eye(4)
      c2e[:3, :3] = Quaternion(cal["rotation"]).rotation_matrix
      c2e[:3, 3] = cal["translation"]
      c2ws.append(compose_c2w(e2g, c2e).astype(np.float32))
      if data["next"] == "":
        break
      data = nusc.get("sample_data", data["next"])

  os.makedirs(os.path.join(savedir, "images"), exist_ok=True)
  for i, p in enumerate(img_paths):
    shutil.copy(p, os.path.join(savedir, "images", f"{i:04d}.png"))
  arr = build_poses_bounds(np.stack(c2ws), np.stack(Ks), hw)
  np.save(os.path.join(savedir, "poses_bounds.npy"), arr)
  with open(os.path.join(savedir, "token.json"), "w") as f:
    json.dump(sample_idx_list, f)
  with open(os.path.join(savedir, "channel_tokens.json"), "w") as f:
    json.dump(channel_tokens, f)
  return arr
