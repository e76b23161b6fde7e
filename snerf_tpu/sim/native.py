"""ctypes bindings + lazy build for the native geometry core.

C++ source: native/snerf_native.cpp (rasterize + BVH raycast). Built on
first use with g++ (baked into the image); cached next to the source.
Pure-numpy fallbacks keep everything runnable if the toolchain is absent.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "snerf_native.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "libsnerf_native.so")

_lib_handle = None
_lib_failed = False


def _build() -> bool:
  try:
    subprocess.run(
        ["g++", "-O3", "-march=native", "-shared", "-fPIC",
         "-o", _LIB, _SRC],
        check=True, capture_output=True)
    return True
  except (subprocess.CalledProcessError, FileNotFoundError):
    return False


def get_lib() -> Optional[ctypes.CDLL]:
  global _lib_handle, _lib_failed
  if _lib_handle is not None or _lib_failed:
    return _lib_handle
  if not os.path.exists(_LIB) or \
      os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
    if not _build():
      _lib_failed = True
      return None
  lib = ctypes.CDLL(_LIB)
  f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
  i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
  u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
  lib.rasterize.argtypes = [f32p, i32p, f32p, ctypes.c_int32,
                            ctypes.c_int32, ctypes.c_int32, f32p,
                            ctypes.c_int32, ctypes.c_int32, f32p, f32p,
                            u8p]
  lib.raycast.argtypes = [f32p, i32p, ctypes.c_int32, ctypes.c_int32,
                          f32p, f32p, ctypes.c_int32, f32p, i32p]
  _lib_handle = lib
  return lib


def rasterize(verts_cam, faces, attrs, K, hw) -> Tuple[np.ndarray,
                                                       np.ndarray,
                                                       np.ndarray]:
  """Z-buffer rasterization. verts_cam [V,3] camera space (+z forward),
  faces [F,3], attrs [V,C], K [3,3]. Returns (attr [H,W,C], depth [H,W],
  mask [H,W] bool)."""
  H, W = hw
  verts_cam = np.ascontiguousarray(verts_cam, np.float32)
  faces = np.ascontiguousarray(faces, np.int32)
  attrs = np.ascontiguousarray(attrs, np.float32)
  K = np.ascontiguousarray(K, np.float32).reshape(-1)
  C = attrs.shape[1]
  lib = get_lib()
  if lib is not None:
    out_attr = np.zeros((H, W, C), np.float32)
    out_depth = np.zeros((H, W), np.float32)
    out_mask = np.zeros((H, W), np.uint8)
    lib.rasterize(verts_cam, faces, attrs, verts_cam.shape[0],
                  faces.shape[0], C, K, H, W, out_attr, out_depth,
                  out_mask)
    return out_attr, out_depth, out_mask.astype(bool)
  return _rasterize_numpy(verts_cam, faces, attrs, K.reshape(3, 3), hw)


def raycast(verts, faces, origins, dirs) -> Tuple[np.ndarray, np.ndarray]:
  """Closest-hit ray cast. Returns (t [N] (inf = miss), tri_id [N])."""
  verts = np.ascontiguousarray(verts, np.float32)
  faces = np.ascontiguousarray(faces, np.int32)
  origins = np.ascontiguousarray(origins, np.float32)
  dirs = np.ascontiguousarray(dirs, np.float32)
  n = origins.shape[0]
  lib = get_lib()
  if lib is not None:
    out_t = np.zeros(n, np.float32)
    out_tri = np.zeros(n, np.int32)
    lib.raycast(verts, faces, verts.shape[0], faces.shape[0], origins,
                dirs, n, out_t, out_tri)
    return out_t, out_tri
  return _raycast_numpy(verts, faces, origins, dirs)


# ------------------------- numpy fallbacks -------------------------------


def _rasterize_numpy(verts_cam, faces, attrs, K, hw):
  H, W = hw
  C = attrs.shape[1]
  out_attr = np.zeros((H, W, C), np.float32)
  out_depth = np.zeros((H, W), np.float32)
  zbuf = np.full((H, W), np.inf, np.float32)
  mask = np.zeros((H, W), bool)
  z = verts_cam[:, 2]
  with np.errstate(divide="ignore", invalid="ignore"):
    px = K[0, 0] * verts_cam[:, 0] / z + K[0, 2]
    py = K[1, 1] * verts_cam[:, 1] / z + K[1, 2]
  for f in faces:
    if np.any(z[f] <= 1e-6):
      continue
    x0, x1, x2 = px[f]
    y0, y1, y2 = py[f]
    area = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
    if abs(area) < 1e-12:
      continue
    xmin = max(0, int(np.floor(min(x0, x1, x2))))
    xmax = min(W - 1, int(np.ceil(max(x0, x1, x2))))
    ymin = max(0, int(np.floor(min(y0, y1, y2))))
    ymax = min(H - 1, int(np.ceil(max(y0, y1, y2))))
    if xmin > xmax or ymin > ymax:
      continue
    gx, gy = np.meshgrid(np.arange(xmin, xmax + 1),
                         np.arange(ymin, ymax + 1))
    w0 = ((x1 - gx) * (y2 - gy) - (x2 - gx) * (y1 - gy)) / area
    w1 = ((x2 - gx) * (y0 - gy) - (x0 - gx) * (y2 - gy)) / area
    w2 = 1 - w0 - w1
    inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
    iz = (w0 / z[f[0]] + w1 / z[f[1]] + w2 / z[f[2]])
    with np.errstate(divide="ignore"):
      zi = 1.0 / iz
    sub_z = zbuf[ymin:ymax + 1, xmin:xmax + 1]
    upd = inside & (zi < sub_z)
    sub_z[upd] = zi[upd]
    a = (w0[..., None] * attrs[f[0]] / z[f[0]] +
         w1[..., None] * attrs[f[1]] / z[f[1]] +
         w2[..., None] * attrs[f[2]] / z[f[2]]) * zi[..., None]
    out_attr[ymin:ymax + 1, xmin:xmax + 1][upd] = a[upd]
    out_depth[ymin:ymax + 1, xmin:xmax + 1][upd] = zi[upd]
    mask[ymin:ymax + 1, xmin:xmax + 1] |= upd
  return out_attr, out_depth, mask


def _raycast_numpy(verts, faces, origins, dirs):
  v0 = verts[faces[:, 0]]
  e1 = verts[faces[:, 1]] - v0
  e2 = verts[faces[:, 2]] - v0
  n = origins.shape[0]
  out_t = np.full(n, np.inf, np.float32)
  out_tri = np.full(n, -1, np.int32)
  for r in range(n):
    o, d = origins[r], dirs[r]
    p = np.cross(d, e2)
    det = np.einsum("ij,ij->i", e1, p)
    ok = np.abs(det) > 1e-12
    inv_det = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
    tv = o - v0
    u = np.einsum("ij,ij->i", tv, p) * inv_det
    q = np.cross(tv, e1)
    v = (q @ d) * inv_det
    t = np.einsum("ij,ij->i", e2, q) * inv_det
    hit = ok & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) & (t > 1e-6)
    if hit.any():
      i = np.argmin(np.where(hit, t, np.inf))
      out_t[r] = t[i]
      out_tri[r] = i
  return out_t, out_tri
