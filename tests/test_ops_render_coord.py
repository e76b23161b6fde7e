"""Tests for volume rendering, contractions, ray warps, and SO(3)."""

import jax
import jax.numpy as jnp
import numpy as np

from snerf_tpu.ops import coord, lie, render


# ---------------- rendering ----------------


def test_alpha_weights_opaque_wall():
  # Huge density in one interval -> all weight there, acc ~ 1.
  density = jnp.zeros((1, 8)).at[0, 3].set(1e6)
  t_vals = jnp.broadcast_to(jnp.linspace(1.0, 2.0, 9), (1, 9))
  dirs = jnp.array([[0.0, 0.0, 1.0]])
  weights, alpha, trans = render.compute_alpha_weights(density, t_vals, dirs)
  w = np.asarray(weights)
  np.testing.assert_allclose(w[0, 3], 1.0, atol=1e-5)
  np.testing.assert_allclose(w.sum(), 1.0, atol=1e-5)


def test_alpha_weights_empty_space():
  weights, _, _ = render.compute_alpha_weights(
      jnp.zeros((1, 8)), jnp.broadcast_to(jnp.linspace(1, 2, 9), (1, 9)),
      jnp.array([[0.0, 0.0, 1.0]]))
  np.testing.assert_allclose(np.asarray(weights), 0.0, atol=1e-7)


def test_alpha_weights_analytic_transmittance():
  # Constant density sigma: T(t) = exp(-sigma * t), alpha per bin constant.
  sigma = 2.0
  t_vals = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 11), (1, 11))
  weights, alpha, trans = render.compute_alpha_weights(
      jnp.full((1, 10), sigma), t_vals, jnp.array([[0.0, 0.0, 1.0]]))
  expected_trans = np.exp(-sigma * np.asarray(t_vals)[0, :-1])
  np.testing.assert_allclose(np.asarray(trans)[0], expected_trans, rtol=1e-5)


def test_alpha_weights_opaque_background():
  weights, _, _ = render.compute_alpha_weights(
      jnp.zeros((1, 8)), jnp.broadcast_to(jnp.linspace(1, 2, 9), (1, 9)),
      jnp.array([[0.0, 0.0, 1.0]]), opaque_background=True)
  w = np.asarray(weights)
  np.testing.assert_allclose(w[0, -1], 1.0, atol=1e-6)


def test_volumetric_rendering_depth_at_wall():
  # Wall at t ~= 5 within [near=1, far=10], log spacing.
  near = jnp.full((8, 1), 1.0)
  far = jnp.full((8, 1), 10.0)
  s_vals = jnp.broadcast_to(jnp.linspace(0, 1, 65), (8, 65))
  t_vals = coord.s_to_t(s_vals, near, far, "log")
  wall_idx = jnp.argmin(jnp.abs(t_vals[0, :-1] - 5.0))
  density = jnp.zeros((8, 64)).at[:, wall_idx].set(1e5)
  rgb = jnp.ones((8, 64, 3)) * 0.5
  out = render.volumetric_rendering(rgb, density, s_vals,
                                    jnp.tile(jnp.array([[0, 0, 1.0]]), (8, 1)),
                                    near, far)
  np.testing.assert_allclose(np.asarray(out["rgb"]), 0.5, atol=1e-4)
  assert abs(float(out["distance"][0]) - 5.0) < 0.3
  np.testing.assert_allclose(np.asarray(out["acc"]), 1.0, atol=1e-4)


def test_volumetric_rendering_white_bkgd():
  near, far = jnp.full((2, 1), 1.0), jnp.full((2, 1), 10.0)
  s_vals = jnp.broadcast_to(jnp.linspace(0, 1, 9), (2, 9))
  out = render.volumetric_rendering(
      jnp.zeros((2, 8, 3)), jnp.zeros((2, 8)), s_vals,
      jnp.tile(jnp.array([[0, 0, 1.0]]), (2, 1)), near, far,
      white_bkgd=True)
  np.testing.assert_allclose(np.asarray(out["rgb"]), 1.0, atol=1e-6)


def test_zip_rendering_log_depth():
  t_vals = jnp.broadcast_to(jnp.linspace(1.0, 9.0, 9), (1, 9))
  weights = jnp.zeros((1, 8)).at[0, 3].set(1.0)
  rgbs = jnp.ones((1, 8, 3)) * 0.25
  out = render.volumetric_rendering_zip(
      rgbs, weights, t_vals, jnp.zeros(3), jnp.full((1, 1), 100.0),
      compute_extras=True)
  t_mid = 0.5 * (4.0 + 5.0)
  np.testing.assert_allclose(float(out["depth"][0]), t_mid, rtol=1e-5)
  np.testing.assert_allclose(np.asarray(out["rgb"])[0], 0.25, atol=1e-6)
  assert "distance_median" in out


def test_multisample_cast_rays_centers():
  # n multisamples average near the frustum center axis.
  t_vals = jnp.array([[1.0, 2.0]])
  origins = jnp.zeros((1, 3))
  directions = jnp.array([[0.0, 0.0, 1.0]])
  base_x = jnp.array([[1.0, 0.0, 0.0]])
  base_y = jnp.array([[0.0, 1.0, 0.0]])
  radii = jnp.array([0.1])  # [batch] — per-ray scalar radius
  means, stds = render.cast_rays_multisample(None, t_vals, origins,
                                             directions, radii, base_x,
                                             base_y, n=7, m=3)
  assert means.shape == (1, 1, 7, 3)
  m = np.asarray(means)[0, 0]
  # z components lie in (1, 2), strictly increasing by construction.
  assert m[:, 2].min() > 1.0 and m[:, 2].max() < 2.0
  assert np.asarray(stds).shape == (1, 1, 7)


# ---------------- coord ----------------


def test_contract_identity_inside():
  x = jnp.array([[0.3, -0.2, 0.1]])
  np.testing.assert_allclose(coord.contract(x), x, atol=1e-7)


def test_contract_bounded_outside():
  x = jnp.array([[100.0, 0.0, 0.0], [0.0, -1e6, 0.0]])
  z = np.asarray(coord.contract(x))
  norms = np.linalg.norm(z, axis=-1)
  assert np.all(norms < 2.0) and np.all(norms > 1.0)


def test_contract_inverse_roundtrip():
  rng = np.random.RandomState(3)
  x = jnp.array(rng.randn(32, 3) * 5, jnp.float32)
  np.testing.assert_allclose(coord.inv_contract(coord.contract(x)), x,
                             rtol=1e-4, atol=1e-4)


def test_contract_mean_std_jacfwd_consistency():
  # Closed-form det scaling must match autodiff jacobian determinant.
  x = jnp.array([[3.0, 1.0, -2.0]])
  std = jnp.array([0.1])
  z, new_std = coord.contract_mean_std(x, std)
  jac = jax.jacfwd(lambda p: coord.contract(p[None])[0])(x[0])
  det = np.linalg.det(np.asarray(jac))
  np.testing.assert_allclose(float(new_std[0]), 0.1 * det ** (1 / 3),
                             rtol=1e-4)
  np.testing.assert_allclose(z, coord.contract(x), atol=1e-6)


def test_warp_fn2_regions():
  inner = jnp.array([[1.0, 0.0, 0.0]])
  np.testing.assert_allclose(coord.warp_fn2(inner, 3.0),
                             np.array([[1 / 3, 0, 0]]), atol=1e-5)
  outer = jnp.array([[30.0, 0.0, 0.0]])
  out = np.asarray(coord.warp_fn2(outer, 3.0))
  np.testing.assert_allclose(out, [[2 - 3 / 30, 0, 0]], atol=1e-4)


def test_warp_fn2_continuous_at_boundary():
  eps = 1e-4
  a = coord.warp_fn2(jnp.array([[3.0 - eps, 0, 0]]), 3.0)
  b = coord.warp_fn2(jnp.array([[3.0 + eps, 0, 0]]), 3.0)
  np.testing.assert_allclose(a, b, atol=1e-3)


def test_track_gaussian_linear_fn_exact():
  # For a linear map A, covariance propagates exactly: A diag(c) A^T.
  A = jnp.array([[2.0, 0.0, 0.0], [0.0, 3.0, 0.0], [1.0, 0.0, 1.0]])
  fn = lambda x: x @ A.T
  means = jnp.array([[[1.0, 2.0, 3.0]]])
  covs = jnp.array([[[0.1, 0.2, 0.3]]])
  f_means, f_covs = coord.track_gaussian(fn, means, covs)
  np.testing.assert_allclose(f_means[0, 0], A @ means[0, 0], rtol=1e-5)
  want = np.asarray(A) @ np.diag([0.1, 0.2, 0.3]) @ np.asarray(A).T
  np.testing.assert_allclose(np.asarray(f_covs)[0, 0], want, rtol=1e-5)


def test_s_to_t_transforms():
  near, far = jnp.array(1.0), jnp.array(100.0)
  for kind in ["log", "disparity", "linear"]:
    t0 = coord.s_to_t(jnp.array(0.0), near, far, kind)
    t1 = coord.s_to_t(jnp.array(1.0), near, far, kind)
    # TPU exp/log are approximated (~1e-4 rel); tolerance reflects that.
    np.testing.assert_allclose(t0, 1.0, rtol=1e-4)
    np.testing.assert_allclose(t1, 100.0, rtol=1e-4)
  # log midpoint is the geometric mean.
  np.testing.assert_allclose(coord.s_to_t(jnp.array(0.5), near, far, "log"),
                             10.0, rtol=1e-4)


def test_construct_ray_warps_roundtrip():
  t_near, t_far = jnp.array(0.5), jnp.array(1000.0)
  for fn in [None, "piecewise", "reciprocal", "log",
             "power_transformation"]:
    lam = -1.5 if fn == "power_transformation" else None
    t_to_s, s_to_t = coord.construct_ray_warps(fn, t_near, t_far, lam=lam)
    t = jnp.linspace(0.5, 1000.0, 64)
    np.testing.assert_allclose(s_to_t(t_to_s(t)), t, rtol=5e-3)
    np.testing.assert_allclose(t_to_s(t_near), 0.0, atol=1e-5)
    np.testing.assert_allclose(t_to_s(t_far), 1.0, atol=1e-4)


def test_lift_and_diagonalize():
  rng = np.random.RandomState(4)
  mean = jnp.array(rng.randn(5, 3), jnp.float32)
  A = rng.randn(5, 3, 3).astype(np.float32)
  cov = jnp.array(A @ A.transpose(0, 2, 1))
  basis = jnp.array(rng.randn(3, 7), jnp.float32)
  m2, var = coord.lift_and_diagonalize(mean, cov, basis)
  assert m2.shape == (5, 7) and var.shape == (5, 7)
  want = np.einsum("ij,njk,kl->nil", np.asarray(basis).T, np.asarray(cov),
                   np.asarray(basis))
  np.testing.assert_allclose(np.asarray(var),
                             np.diagonal(want, axis1=-2, axis2=-1),
                             rtol=1e-4)


# ---------------- lie ----------------


def test_exp_so3_zero_is_identity():
  R = lie.exp_so3(jnp.zeros((2, 3)))
  np.testing.assert_allclose(R, np.broadcast_to(np.eye(3), (2, 3, 3)),
                             atol=1e-7)


def test_exp_so3_quarter_turn():
  r = jnp.array([[0.0, 0.0, np.pi / 2]])
  R = np.asarray(lie.exp_so3(r))[0]
  want = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float32)
  np.testing.assert_allclose(R, want, atol=1e-6)


def test_exp_log_roundtrip():
  rng = np.random.RandomState(5)
  r = jnp.array(rng.randn(16, 3).astype(np.float32) * 0.5)
  r_back = lie.log_so3(lie.exp_so3(r))
  np.testing.assert_allclose(r_back, r, atol=1e-4)


def test_exp_so3_orthonormal():
  rng = np.random.RandomState(6)
  r = jnp.array(rng.randn(8, 3).astype(np.float32))
  R = np.asarray(lie.exp_so3(r))
  RtR = R.transpose(0, 2, 1) @ R
  np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), (8, 3, 3)),
                             atol=1e-5)
  np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_make_c2w_identity_delta():
  c2w = jnp.array([[[1.0, 0, 0, 5], [0, 1, 0, 6], [0, 0, 1, 7]]])
  out = lie.make_c2w(jnp.zeros((1, 3)), jnp.zeros((1, 3)), c2w)
  np.testing.assert_allclose(out, c2w, atol=1e-6)


def test_make_c2w_translation_delta():
  c2w = jnp.array([[[1.0, 0, 0, 5], [0, 1, 0, 6], [0, 0, 1, 7]]])
  out = lie.make_c2w(jnp.zeros((1, 3)), jnp.array([[1.0, 2.0, 3.0]]), c2w)
  np.testing.assert_allclose(np.asarray(out)[0, :, 3], [6, 8, 10], atol=1e-6)


def test_warp_fn2_gaussian_matches_jacfwd():
  """Closed-form fn2 Jacobian propagation == autodiff track_gaussian."""
  rng = np.random.RandomState(0)
  means = jnp.asarray(rng.randn(6, 5, 3) * 3.0, jnp.float32)  # in+out
  covs = jnp.asarray(rng.uniform(0.001, 0.05, (6, 5, 3)), jnp.float32)
  fm1, fc1 = coord.track_gaussian(
      lambda x: coord.warp_fn2(x, radius=3.0), means, covs)
  fm2, fc2 = coord.warp_fn2_gaussian(means, covs, radius=3.0)
  np.testing.assert_allclose(np.asarray(fm2), np.asarray(fm1),
                             rtol=1e-5, atol=1e-6)
  np.testing.assert_allclose(np.asarray(fc2), np.asarray(fc1),
                             rtol=1e-4, atol=1e-6)


def test_warp_fn2_gaussian_diag_matches_full():
  rng = np.random.RandomState(5)
  means = jnp.asarray(rng.randn(4, 6, 3) * 3.0, jnp.float32)
  covs = jnp.asarray(rng.uniform(0.001, 0.05, (4, 6, 3)), jnp.float32)
  fm_full, fc_full = coord.warp_fn2_gaussian(means, covs, radius=3.0)
  fm_diag, fd = coord.warp_fn2_gaussian_diag(means, covs, radius=3.0)
  np.testing.assert_allclose(np.asarray(fm_diag), np.asarray(fm_full),
                             atol=1e-6)
  full_diag = np.diagonal(np.asarray(fc_full), axis1=-2, axis2=-1)
  np.testing.assert_allclose(np.asarray(fd), full_diag, rtol=1e-4,
                             atol=1e-7)
  # and identical IPE features either way
  from snerf_tpu.ops import mip
  e1 = mip.integrated_pos_enc(fm_full, fc_full, 0, 8, diag=False)
  e2 = mip.integrated_pos_enc(fm_diag, fd, 0, 8, diag=True)
  np.testing.assert_allclose(np.asarray(e2), np.asarray(e1), rtol=1e-4,
                             atol=1e-5)
