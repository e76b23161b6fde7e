"""On-device ray generation (jit-/vmap-/shard-clean).

Behavioral parity target (math re-derived): reference
s-nerf/utils/sample_utils.py:92-211 (camera dirs from intrinsics with the
(i - cx + 0.5)/f, -(j - cy + 0.5)/f, -1 convention; mip radii from neighbor
direction spacing) and get_rays_single_img (:286-345).

TPU-first: for an undistorted pinhole camera the neighbor-direction spacing
is exactly 1/f in camera space (rotation preserves norms), so the mip base
radius is the closed form 2 / (f * sqrt(12)) — no H x W neighbor-difference
pass needed. Rays are generated per-pixel-id inside the jitted step.
"""

from __future__ import annotations

import jax.numpy as jnp

from snerf_tpu.ops.rays import Rays


def camera_dirs_from_pixels(px, py, intrinsic, distortion_params=None,
                            camtype: str = "perspective"):
  """Pixel coords -> camera-space dirs. px/py: [...], intrinsic: [..., 3, 3].

  distortion_params: optional dict of OPENCV coefficients (k1..k4, p1, p2)
  inverted by Newton iteration; camtype "fisheye" applies the equidistant
  fisheye model (zipnerf camera_utils.py:378-524 parity).
  """
  from snerf_tpu.data import camera_utils
  cx = intrinsic[..., 0, 2]
  cy = intrinsic[..., 1, 2]
  if distortion_params is None and camtype == "perspective":
    f = (intrinsic[..., 0, 0] + intrinsic[..., 1, 1]) / 2
    return jnp.stack([
        (px - cx + 0.5) / f,
        -(py - cy + 0.5) / f,
        -jnp.ones_like(px),
    ], axis=-1)
  # OpenCV-convention plane coords (z forward), then flip to [r, u, -t]
  x = (px + 0.5 - cx) / intrinsic[..., 0, 0]
  y = (py + 0.5 - cy) / intrinsic[..., 1, 1]
  if distortion_params:
    x, y = camera_utils.radial_and_tangential_undistort(
        x, y, xnp=jnp, **distortion_params)
  if camtype == "fisheye":
    x, y, z = camera_utils.fisheye_to_perspective_dirs(x, y, xnp=jnp)
  else:
    z = jnp.ones_like(x)
  return jnp.stack([x, -y, -z], axis=-1)


def pixels_to_rays(px, py, c2w, intrinsic, near, far, app=None,
                   lossmult=None, distortion_params=None,
                   camtype: str = "perspective"):
  """Build a Rays bundle from pixel coords + per-ray camera params.

  px, py: [...] float (x = column, y = row); c2w: [..., 3, 4];
  intrinsic: [..., 3, 3]; near/far: scalars or [...].
  """
  distorted = distortion_params is not None or camtype != "perspective"
  cam_dirs = camera_dirs_from_pixels(px, py, intrinsic,
                                     distortion_params, camtype)
  directions = jnp.einsum("...ij,...j->...i", c2w[..., :3, :3], cam_dirs)
  origins = jnp.broadcast_to(c2w[..., :3, 3], directions.shape)
  viewdirs = directions / jnp.linalg.norm(
      directions, axis=-1, keepdims=True)

  if distorted:
    # neighbor-direction spacing (reference pixels_to_rays
    # camera_utils.py:493-564): distortion warps the pixel footprint, so
    # the closed form no longer holds.
    dx_dirs = camera_dirs_from_pixels(px + 1.0, py, intrinsic,
                                      distortion_params, camtype)
    dy_dirs = camera_dirs_from_pixels(px, py + 1.0, intrinsic,
                                      distortion_params, camtype)
    dx_norm = jnp.linalg.norm(dx_dirs - cam_dirs, axis=-1)
    dy_norm = jnp.linalg.norm(dy_dirs - cam_dirs, axis=-1)
    radii = (0.5 * (dx_norm + dy_norm) * 2.0 / jnp.sqrt(12.0))[..., None]
  else:
    f = (intrinsic[..., 0, 0] + intrinsic[..., 1, 1]) / 2
    # Closed-form mip radius (see module docstring).
    radii = (1.0 / f * 2.0 / jnp.sqrt(12.0))[..., None]
    radii = jnp.broadcast_to(radii, directions.shape[:-1] + (1,))

  ones = jnp.ones(directions.shape[:-1] + (1,), directions.dtype)
  near = jnp.broadcast_to(jnp.asarray(near, directions.dtype), ones.shape)
  far = jnp.broadcast_to(jnp.asarray(far, directions.dtype), ones.shape)
  if app is None:
    app = jnp.zeros(ones.shape, jnp.int32)
  else:
    app = jnp.broadcast_to(jnp.asarray(app)[..., None], ones.shape
                           ).astype(jnp.int32)
  lossmult = ones if lossmult is None else lossmult
  return Rays(origins=origins, directions=directions, viewdirs=viewdirs,
              radii=radii, lossmult=lossmult, near=near, far=far, app=app)


def rays_for_image(c2w, intrinsic, H: int, W: int, near, far, app=None,
                   render_factor: int = 0):
  """Full-image ray grid [H, W] (reference get_rays_single_img parity).

  render_factor > 0 downsamples by that integer factor (render-time preview).
  """
  if render_factor:
    H2, W2 = H // render_factor, W // render_factor
    # Sample pixel centers of the downscaled grid mapped into original coords.
    ys = (jnp.arange(H2) + 0.5) * (H / H2) - 0.5
    xs = (jnp.arange(W2) + 0.5) * (W / W2) - 0.5
  else:
    ys = jnp.arange(H, dtype=jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)
  py, px = jnp.meshgrid(ys, xs, indexing="ij")
  rays = pixels_to_rays(px, py, c2w, intrinsic, near, far, app=app)
  if render_factor:
    # Each downscaled pixel covers factor^2 original pixels; widen the mip
    # base radius to match the pixel area actually integrated (the
    # reference scales focal/H/W together for render_factor).
    scale = ((H / H2) + (W / W2)) / 2.0
    rays = rays.replace(radii=rays.radii * scale)
  return rays


def rays_for_panorama(c2w, H: int, W: int, near, far, app=None):
  """Equirectangular panorama rays (reference sample_utils.py:229-284):
  azimuth spans [-pi, pi) over width, elevation [-pi/2, pi/2] over height.
  """
  theta = (jnp.arange(W) + 0.5) / W * 2 * jnp.pi - jnp.pi   # azimuth
  phi = (jnp.arange(H) + 0.5) / H * jnp.pi - jnp.pi / 2     # elevation
  phi, theta = jnp.meshgrid(phi, theta, indexing="ij")
  # camera convention [r, u, -t]: forward is -z
  dirs_cam = jnp.stack([
      jnp.cos(phi) * jnp.sin(theta),
      jnp.sin(phi),
      -jnp.cos(phi) * jnp.cos(theta)], axis=-1)
  directions = jnp.einsum("ij,hwj->hwi", c2w[:3, :3], dirs_cam)
  origins = jnp.broadcast_to(c2w[:3, 3], directions.shape)
  viewdirs = directions
  # pixel solid-angle-derived radius: one azimuth step
  radii = jnp.full(directions.shape[:-1] + (1,),
                   2 * jnp.pi / W * 2 / jnp.sqrt(12.0))
  ones = jnp.ones(directions.shape[:-1] + (1,))
  if app is None:
    app = jnp.zeros(ones.shape, jnp.int32)
  from snerf_tpu.ops.rays import Rays as _R
  return _R(origins=origins, directions=directions, viewdirs=viewdirs,
            radii=radii, lossmult=ones,
            near=jnp.broadcast_to(jnp.asarray(near, jnp.float32),
                                  ones.shape),
            far=jnp.broadcast_to(jnp.asarray(far, jnp.float32),
                                 ones.shape),
            app=app)
