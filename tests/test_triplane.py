"""Dense tri-plane fine encoder (models/triplane.py) + its zip wiring.

Capability parity target: the fine levels of the reference gridencoder
(s-nerfpp/zipnerf/gridencoder/src/gridencoder.cu:50-160), rebuilt as
three dense collision-free 2D planes for v5e (12 gathers/query in the
measured-fast row form; PERF.md).
"""

import jax
import jax.numpy as jnp
import numpy as np

from snerf_tpu.models.triplane import (TriplaneEncoding, _PLANE_AXES,
                                       triplane_encode)


def _planes(r=8, c=2, seed=0):
  rng = np.random.RandomState(seed)
  return jnp.asarray(rng.randn(3, r * r, c).astype(np.float32))


def test_bilinear_matches_manual():
  r, c = 8, 2
  planes = _planes(r, c)
  x = jnp.asarray([[0.3, 0.55, 0.8]])
  out = np.asarray(triplane_encode(x, planes, r))  # [1, 3, C]
  tab = np.asarray(planes).reshape(3, r, r, c)
  for p, (a, b) in enumerate(_PLANE_AXES):
    u, v = float(x[0, a]) * (r - 1), float(x[0, b]) * (r - 1)
    i0, j0 = int(np.floor(u)), int(np.floor(v))
    fu, fv = u - i0, v - j0
    want = ((1 - fu) * (1 - fv) * tab[p, i0, j0] +
            (1 - fu) * fv * tab[p, i0, j0 + 1] +
            fu * (1 - fv) * tab[p, i0 + 1, j0] +
            fu * fv * tab[p, i0 + 1, j0 + 1])
    np.testing.assert_allclose(out[0, p], want, rtol=1e-5, atol=1e-6)


def test_grid_node_is_exact_and_oob_zero():
  r = 8
  planes = _planes(r)
  # exactly on a grid node: feature == the node row, per plane
  x = jnp.asarray([[3.0 / (r - 1), 5.0 / (r - 1), 2.0 / (r - 1)]])
  out = np.asarray(triplane_encode(x, planes, r))
  tab = np.asarray(planes).reshape(3, r, r, -1)
  nodes = {0: (3, 5), 1: (5, 2), 2: (3, 2)}
  for p, (i, j) in nodes.items():
    np.testing.assert_allclose(out[0, p], tab[p, i, j], rtol=1e-5,
                               atol=1e-6)
  oob = np.asarray(triplane_encode(
      jnp.asarray([[1.2, 0.5, 0.5], [-0.1, 0.2, 0.2]]), planes, r))
  assert (oob == 0).all()


def test_gradients_reach_all_planes():
  r = 8
  planes = _planes(r)
  x = jnp.asarray(np.random.RandomState(1).rand(32, 3).astype(np.float32))

  def loss(p):
    return jnp.sum(triplane_encode(x, p, r) ** 2)

  g = np.asarray(jax.grad(loss)(planes))
  for p in range(3):
    assert np.abs(g[p]).max() > 0, f"plane {p} got no gradient"


def test_module_shapes_and_grid_sizes():
  m = TriplaneEncoding(resolution=16, level_dim=4)
  x = jnp.asarray(np.random.RandomState(0).rand(5, 3, 3).astype(np.float32))
  variables = m.init(jax.random.PRNGKey(0), x)
  out = m.apply(variables, x)
  assert out.shape == (5, 3, 3, 4)
  assert variables["params"]["planes"].shape == (3, 256, 4)
  sizes = m.bind(variables).grid_sizes
  np.testing.assert_array_equal(sizes, [16.0, 16.0, 16.0])


def test_zipnerf_cp_tri_forward_and_grad():
  """cp_tri end-to-end: finite render, fine planes receive gradient,
  and the shared cp_hash_* query modes run."""
  from snerf_tpu.models.zipnerf import ZipNerfConfig, init_zipnerf
  from snerf_tpu.ops.rays import Rays
  n = 5
  d = np.random.RandomState(1).randn(n, 3).astype(np.float32)
  rays = Rays(origins=jnp.zeros((n, 3)), directions=jnp.asarray(d),
              viewdirs=jnp.asarray(d / np.linalg.norm(d, axis=-1,
                                                      keepdims=True)),
              radii=jnp.full((n, 1), 0.01), lossmult=jnp.ones((n, 1)),
              near=jnp.full((n, 1), 0.1), far=jnp.full((n, 1), 10.0),
              app=jnp.zeros((n, 1), jnp.int32))
  base = dict(
      encoder_type="cp_tri", num_prop_samples=(4,), num_levels=2,
      num_nerf_samples=4, sample_n=2, cp_num_levels=2, cp_level_dim=4,
      cp_base_resolution=16, cp_max_resolution=64, ipe_max_deg=6,
      cp_tri_resolution=32, cp_tri_level_dim=2,
      ipe_density_width=16, ipe_density_depth=2,
      bottleneck_width=16, net_width_viewdirs=16)
  for tag, kw in (("collapsed_nospread", dict(cp_hash_use_spread=False)),
                  ("per_sample", dict(cp_hash_per_sample=True)),
                  ("split2", dict(cp_hash_use_spread=False,
                                  cp_hash_split=2))):
    cfg = ZipNerfConfig(**base, **kw)
    model, variables = init_zipnerf(jax.random.PRNGKey(0), cfg)
    params = variables["params"]
    assert params["nerf_mlp"]["tri_fine"]["planes"].shape == (3, 1024, 2)

    def loss(p):
      rend, _ = model.apply({"params": p}, rays,
                            rng=jax.random.PRNGKey(1), train_frac=0.5)
      return jnp.mean(rend[-1]["rgb"] ** 2)

    g = jax.grad(loss)(params)
    gp = np.asarray(g["nerf_mlp"]["tri_fine"]["planes"])
    assert np.isfinite(gp).all(), tag
    assert np.abs(gp).max() > 0, tag
