"""Classic-NeRF MLP torch-parity: reference run_nerf_helpers.NeRF with
the same weights vs our ClassicNerfMLP (feature order permuted: the
reference embedder interleaves sin/cos per frequency; ours groups all
sins then all coses)."""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference/s-nerf"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference not mounted")

MULTIRES = 4        # xyz pos-enc degrees
MULTIRES_VIEW = 2
W_NET = 32


def _embed_perm(input_dims: int, n_freqs: int):
  """p such that w_ours = w_ref[p]: p[j] = reference-feature index of our
  j-th feature.

  ours:   [identity(d) | sin(2^0)·d .. sin(2^{L-1})·d | cos(2^0)·d .. ]
  theirs: [identity(d) | sin(2^0)·d, cos(2^0)·d, sin(2^1)·d, ...]
  """
  d, L = input_dims, n_freqs
  theirs2ours = list(range(d))
  for f in range(L):
    theirs2ours.extend(range(d + f * d, d + (f + 1) * d))          # sin
    theirs2ours.extend(range(d + L * d + f * d,
                             d + L * d + (f + 1) * d))             # cos
  return np.argsort(np.array(theirs2ours))


def test_classic_mlp_parity():
  sys.path.append(REF)  # APPEND: inserting at 0 makes bare
  # 'import train' resolve to the REFERENCE's train.py for every
  # later test in the process
  try:
    import torch
    from model.run_nerf_helpers import NeRF, get_embedder
    import jax
    import jax.numpy as jnp
    from snerf_tpu.models.classic import ClassicNerfConfig, ClassicNerfMLP
    from snerf_tpu.ops import mip

    embed_fn, ch = get_embedder(MULTIRES, 0)
    embed_view_fn, ch_view = get_embedder(MULTIRES_VIEW, 0)
    torch.manual_seed(0)
    ref = NeRF(D=4, W=W_NET, input_ch=ch, input_ch_views=ch_view,
               output_ch=4, skips=[2], use_viewdirs=True).eval()

    rng = np.random.RandomState(0)
    pts = rng.randn(6, 5, 3).astype(np.float32)
    views = rng.randn(6, 3).astype(np.float32)
    views /= np.linalg.norm(views, -1, keepdims=True)

    pts_flat = torch.tensor(pts.reshape(-1, 3))
    views_rep = torch.tensor(
        np.repeat(views[:, None], 5, 1).reshape(-1, 3))
    with torch.no_grad():
      ref_out = ref(torch.cat([embed_fn(pts_flat),
                               embed_view_fn(views_rep)], -1))
    ref_out = ref_out.numpy().reshape(6, 5, 4)

    # map weights; the first layer consumes reference-ordered features,
    # so permute its input rows into our feature order
    perm_pts = _embed_perm(3, MULTIRES)
    perm_view = _embed_perm(3, MULTIRES_VIEW)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}

    def dense(w_key, b_key, in_perm=None):
      w = sd[w_key].T
      if in_perm is not None:
        w = w[in_perm]
      return {"kernel": w, "bias": sd[b_key]}

    params = {}
    # reference pts_linears: layer i; skip at i in skips applied to the
    # INPUT of layer i+1 as cat([input_pts, h])
    params["pts_0"] = dense("pts_linears.0.weight", "pts_linears.0.bias",
                            perm_pts)
    params["pts_1"] = dense("pts_linears.1.weight", "pts_linears.1.bias")
    params["pts_2"] = dense("pts_linears.2.weight", "pts_linears.2.bias")
    # layer 3 input = [input_pts(ch) | h(W)] in reference order
    w3 = sd["pts_linears.3.weight"].T
    w3 = np.concatenate([w3[:ch][perm_pts], w3[ch:]], 0)
    params["pts_3"] = {"kernel": w3, "bias": sd["pts_linears.3.bias"]}
    params["alpha"] = dense("alpha_linear.weight", "alpha_linear.bias")
    params["feature"] = dense("feature_linear.weight",
                              "feature_linear.bias")
    wv = sd["views_linears.0.weight"].T  # input [feature(W) | views(ch_v)]
    wv = np.concatenate([wv[:W_NET],
                         wv[W_NET:][perm_view]], 0)
    params["views_0"] = {"kernel": wv, "bias": sd["views_linears.0.bias"]}
    params["rgb"] = dense("rgb_linear.weight", "rgb_linear.bias")

    cfg = ClassicNerfConfig(net_depth=4, net_width=W_NET, skip_layer=2,
                            multires=MULTIRES,
                            multires_views=MULTIRES_VIEW)
    mlp = ClassicNerfMLP(cfg=cfg)
    pts_enc = mip.pos_enc(jnp.asarray(pts), 0, MULTIRES,
                          append_identity=True)
    v_enc = mip.pos_enc(jnp.asarray(views), 0, MULTIRES_VIEW,
                        append_identity=True)
    with jax.default_matmul_precision("float32"):
      ours = mlp.apply({"params": params}, pts_enc, v_enc)
    np.testing.assert_allclose(np.asarray(ours), ref_out, rtol=1e-4,
                               atol=1e-5)
  finally:
    sys.path.remove(REF)
