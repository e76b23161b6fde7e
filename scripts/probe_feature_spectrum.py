"""Analytic featurization diff for the zip-vs-mip gap (round-4 batch
10 companion): per-degree IPE feature energy of the two featurization
chains on IDENTICAL realfocal fixture intervals — no training.

mip chain  : cylinder cast (anisotropic diag cov, raw world coords)
             -> integrated_pos_enc deg 0..16           (mipnerf.py:87-95)
zip chain  : multisample cast (isotropic std = 0.35 r t)
             -> scene_scale 0.2725 -> contract_mean_std
             -> isotropic IPE deg 0..16 -> mean over n (zipnerf.py)

The IPE expected-sin amplitude at degree j is exp(-0.5 * 4^j * var):
whichever chain carries larger effective variance band-limits the
features at a lower degree, and the trunk can never recover what the
encoding already zeroed — a direct, training-free test of whether the
featurization chain explains the 10 dB train-fit gap.

Usage: JAX_PLATFORMS=cpu python scripts/probe_feature_spectrum.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
  import jax
  jax.config.update("jax_platforms", "cpu")
  import jax.numpy as jnp

  import bench_quality as bq
  from snerf_tpu.data.raygen import rays_for_image
  from snerf_tpu.ops import coord, mip, render

  scene = bq.load_fixture()
  ti = int(np.asarray(scene.i_train)[0])
  rays = rays_for_image(jnp.asarray(scene.poses[ti]),
                        jnp.asarray(scene.intrinsics[ti]),
                        scene.hw[0], scene.hw[1], scene.near, scene.far)
  flat = jax.tree_util.tree_map(lambda x: x.reshape(-1, x.shape[-1]),
                                rays)
  idx = np.linspace(0, flat.origins.shape[0] - 1, 256).astype(int)
  r = jax.tree_util.tree_map(lambda x: jnp.asarray(x[idx]), flat)

  # identical linear-t interval ladder (64 intervals, mip's mipeq
  # protocol: raydist None)
  S = 64
  s = jnp.linspace(0.0, 1.0, S + 1)
  t = r.near + (r.far - r.near) * s  # [N, S+1]

  deg = 16
  N = 7  # zip sample_n default; the mipeq arm used 1 — report both

  # --- mip chain ---------------------------------------------------------
  means_m, covs_m = mip.cast_rays(t, r.origins, r.directions, r.radii,
                                  "cylinder", diag=True)
  enc_m = np.asarray(mip.integrated_pos_enc(means_m, covs_m, 0, deg,
                                            diag=True))

  def zip_chain(n, key=None):
    from snerf_tpu.models.zipnerf import _ray_basis
    bx, by = _ray_basis(r.directions)
    means, stds = render.cast_rays_multisample(
        key, t, r.origins, r.directions, r.radii[..., 0], bx, by,
        n=n, m=3)
    ss = 0.2725
    z, new_std = coord.contract_mean_std(means * ss, stds * ss)
    enc = mip.integrated_pos_enc(
        z, jnp.broadcast_to((new_std ** 2)[..., None], z.shape),
        0, deg, diag=True)
    return np.asarray(enc.mean(axis=-2))

  enc_z1 = zip_chain(1)
  enc_z7 = zip_chain(7)

  def by_degree(enc):
    # layout [deg0_xyz, deg1_xyz, ... | cos same]: fold sin/cos and xyz
    e = enc.reshape(*enc.shape[:-1], 2, deg, 3)
    return np.sqrt((e ** 2).mean(axis=(0, 1, 2, 4)))

  em, ez1, ez7 = by_degree(enc_m), by_degree(enc_z1), by_degree(enc_z7)
  print("| deg | mip rms | zip n=1 rms | zip n=7 rms |")
  print("|---|---|---|---|")
  for j in range(deg):
    print(f"| {j} | {em[j]:.4f} | {ez1[j]:.4f} | {ez7[j]:.4f} |")

  # effective cutoff: first degree where rms < 0.05
  def cutoff(e):
    for j in range(deg):
      if e[j] < 0.05:
        return j
    return deg
  print(f"cutoff deg (rms<0.05): mip={cutoff(em)} "
        f"zip_n1={cutoff(ez1)} zip_n7={cutoff(ez7)}")

  # stage bisect for the n=1 chain: where does the variance come from?
  from snerf_tpu.models.zipnerf import _ray_basis
  bx, by = _ray_basis(r.directions)
  means1, stds1 = render.cast_rays_multisample(
      None, t, r.origins, r.directions, r.radii[..., 0], bx, by, n=1,
      m=3)
  tm = 0.5 * (t[..., :-1] + t[..., 1:])
  print("\nper-interval scales (median over rays x intervals):")
  print(f"  zip isotropic std (raw world) : "
        f"{np.median(np.asarray(stds1)):.5f}")
  print(f"  mip diag cov sqrt by axis     : "
        f"{[round(float(np.median(np.sqrt(np.asarray(covs_m))[..., k])), 5) for k in range(3)]}")
  print(f"  interval half-width dt/2      : "
        f"{float(np.median(np.asarray(t[..., 1:] - t[..., :-1]) / 2)):.5f}")
  print(f"  radii                         : "
        f"{float(np.median(np.asarray(r.radii))):.5f}")
  print(f"  t range                       : "
        f"{float(np.min(np.asarray(t))):.3f}..{float(np.max(np.asarray(t))):.3f}")


if __name__ == "__main__":
  main()
