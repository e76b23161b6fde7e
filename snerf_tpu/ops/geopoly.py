"""Geodesic-polyhedron direction bases (RefNeRF / mip-360 machinery).

Behavioral parity target (construction re-derived): reference
s-nerfpp/zipnerf/internal/geopoly.py:1-108 — tesselate an icosahedron or
octahedron and keep one vertex per symmetric (+/-v) pair as a [3, n]
projection basis. Host-side numpy (runs once at model build).
"""

from __future__ import annotations

import itertools

import numpy as np


def compute_sq_dist(mat0, mat1=None):
  """Pairwise squared distances between the COLUMNS of mat0/mat1."""
  if mat1 is None:
    mat1 = mat0
  n0 = np.sum(mat0 ** 2, 0)
  n1 = np.sum(mat1 ** 2, 0)
  return np.maximum(0, n0[:, None] + n1[None, :] - 2 * mat0.T @ mat1)


def compute_tesselation_weights(v: int):
  """Barycentric lattice weights subdividing a triangle v times."""
  if v < 1:
    raise ValueError(f"v {v} must be >= 1")
  pts = [(i, j, v - i - j) for i in range(v + 1) for j in range(v + 1 - i)]
  return np.array(pts, np.float64) / v


def tesselate_geodesic(base_verts, base_faces, v: int, eps: float = 1e-4):
  """Subdivide each face barycentrically, project onto the unit sphere,
  and deduplicate vertices closer than eps."""
  weights = compute_tesselation_weights(v)
  verts = []
  for face in base_faces:
    new = weights @ base_verts[face, :]
    new = new / np.linalg.norm(new, axis=1, keepdims=True)
    verts.append(new)
  verts = np.concatenate(verts, 0)
  # deduplicate (order-preserving, first occurrence kept)
  sq = compute_sq_dist(verts.T)
  keep = np.ones(len(verts), bool)
  for i in range(len(verts)):
    if not keep[i]:
      continue
    dup = (sq[i] < eps) & (np.arange(len(verts)) > i)
    keep[dup] = False
  return verts[keep]


def generate_basis(base_shape: str, angular_tesselation: int,
                   remove_symmetries: bool = True, eps: float = 1e-4):
  """[3, n] direction basis from a tesselated polyhedron."""
  if base_shape == "icosahedron":
    a = (np.sqrt(5) + 1) / 2
    verts = np.array(
        [(-1, 0, a), (1, 0, a), (-1, 0, -a), (1, 0, -a), (0, a, 1),
         (0, a, -1), (0, -a, 1), (0, -a, -1), (a, 1, 0), (-a, 1, 0),
         (a, -1, 0), (-a, -1, 0)]) / np.sqrt(a + 2)
    faces = np.array(
        [(0, 4, 1), (0, 9, 4), (9, 5, 4), (4, 5, 8), (4, 8, 1),
         (8, 10, 1), (8, 3, 10), (5, 3, 8), (5, 2, 3), (2, 7, 3),
         (7, 10, 3), (7, 6, 10), (7, 11, 6), (11, 0, 6), (0, 1, 6),
         (6, 1, 10), (9, 0, 11), (9, 11, 2), (9, 2, 5), (7, 2, 11)])
    verts = tesselate_geodesic(verts, faces, angular_tesselation)
  elif base_shape == "octahedron":
    verts = np.array([(0, 0, -1), (0, 0, 1), (0, -1, 0), (0, 1, 0),
                      (-1, 0, 0), (1, 0, 0)], np.float64)
    corners = np.array(list(itertools.product([-1, 1], repeat=3)))
    pairs = np.argwhere(compute_sq_dist(corners.T, verts.T) == 2)
    faces = np.sort(np.reshape(pairs[:, 1], [3, -1]).T, 1)
    verts = tesselate_geodesic(verts, faces, angular_tesselation)
  else:
    raise ValueError(f"base_shape {base_shape} not supported")

  if remove_symmetries:
    match = compute_sq_dist(verts.T, -verts.T) < eps
    verts = verts[np.any(np.triu(match), 1), :]
  return verts[:, ::-1]
