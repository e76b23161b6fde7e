"""Round-3 quality x speed A/B: zip-nerf encoder arms on the 24-view
protocol (same scene/steps/budget as scripts/ab_ipe_vs_hash.py) plus a
rays/s measurement at the FULL reference sample budget ((64,64)+32,
n=7, batch 4096).

Target (VERDICT r2 #1): one configuration >= 43 dB held-out AND
>= 10k rays/s at the reference budget on one v5e.

Usage: python scripts/ab_round3.py [arm ...]
Arms: ipe ipe_anneal cp cp_ipe cp_hi hash  (default: cp cp_ipe ipe_anneal)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from snerf_tpu.data import make_synthetic_scene
from snerf_tpu.data.sampler import scene_to_device
from snerf_tpu.models.zipnerf import ZipNerfConfig
from snerf_tpu.train.zip_trainer import (
    ZipTrainConfig, create_zip_train_state, make_zip_train_step)

STEPS = int(os.environ.get("AB_STEPS", 1200))
BATCH = int(os.environ.get("AB_BATCH", 1024))
SKIP_REFBUDGET = bool(int(os.environ.get("AB_SKIP_REFBUDGET", "0")))
SEED = int(os.environ.get("AB_SEED", 0))  # seed-noise studies
COMMON = dict(num_prop_samples=(16, 16), num_nerf_samples=8, sample_n=3,
              raydist_fn="power_transformation")

ARMS = {
    # round-2 reference arms
    "ipe": (dict(encoder_type="ipe", ipe_max_deg=14), dict(lr=2e-3)),
    "hash": (dict(encoder_type="hash", grid_num_levels=10,
                  grid_log2_hashmap_size=19), dict(lr=8e-3)),
    # round-3 candidates
    "ipe_anneal": (dict(encoder_type="ipe", ipe_max_deg=16,
                        ipe_anneal_frac=0.5), dict(lr=2e-3)),
    "cp": (dict(encoder_type="cp", cp_num_levels=4, cp_level_dim=16,
                cp_base_resolution=128, cp_max_resolution=1024),
           dict(lr=2e-3, encoder_lr_mult=4.0)),
    "cp_ipe": (dict(encoder_type="cp_ipe", ipe_max_deg=12,
                    cp_num_levels=4, cp_level_dim=16,
                    cp_base_resolution=128, cp_max_resolution=1024),
               dict(lr=2e-3, encoder_lr_mult=4.0)),
    "cp_hi": (dict(encoder_type="cp_ipe", ipe_max_deg=12,
                   cp_num_levels=5, cp_level_dim=16,
                   cp_base_resolution=64, cp_max_resolution=2048),
              dict(lr=2e-3, encoder_lr_mult=4.0)),
    # rank scaling: CP total rank 4x64=256 (TensoRF-CP class capacity)
    "cp_f64": (dict(encoder_type="cp_ipe", ipe_max_deg=12,
                    cp_num_levels=4, cp_level_dim=64,
                    cp_base_resolution=128, cp_max_resolution=1024),
               dict(lr=2e-3, encoder_lr_mult=4.0)),
    # isolate the moment-matched collapse (default True above)
    "cp_f64_nc": (dict(encoder_type="cp_ipe", ipe_max_deg=12,
                       cp_num_levels=4, cp_level_dim=64,
                       cp_collapse_multisamples=False,
                       cp_base_resolution=128, cp_max_resolution=1024),
                  dict(lr=2e-3, encoder_lr_mult=4.0)),
    # rank + resolution + sharper bumps
    "cp_f64_hi": (dict(encoder_type="cp_ipe", ipe_max_deg=12,
                       cp_num_levels=5, cp_level_dim=64,
                       cp_base_resolution=128, cp_max_resolution=2048,
                       cp_bump_width=0.6),
                  dict(lr=2e-3, encoder_lr_mult=4.0)),
    # coarse-to-fine annealing over CP levels + IPE degrees
    "cp_anneal": (dict(encoder_type="cp_ipe", ipe_max_deg=12,
                       cp_num_levels=4, cp_level_dim=64,
                       cp_base_resolution=128, cp_max_resolution=1024,
                       cp_anneal_frac=0.3, ipe_anneal_frac=0.3),
                  dict(lr=2e-3, encoder_lr_mult=4.0)),
    # --- run-3 stability sweep (F=64 diverged at table lr 8e-3;
    # annealing rescued it -> isolate lr / init / rank) ---
    "cp16_col": (dict(encoder_type="cp_ipe", ipe_max_deg=12,
                      cp_num_levels=4, cp_level_dim=16,
                      cp_base_resolution=128, cp_max_resolution=1024),
                 dict(lr=2e-3, encoder_lr_mult=4.0)),
    "cp32_col": (dict(encoder_type="cp_ipe", ipe_max_deg=12,
                      cp_num_levels=4, cp_level_dim=32,
                      cp_base_resolution=128, cp_max_resolution=1024),
                 dict(lr=2e-3, encoder_lr_mult=4.0)),
    "cp64_lr1": (dict(encoder_type="cp_ipe", ipe_max_deg=12,
                      cp_num_levels=4, cp_level_dim=64,
                      cp_base_resolution=128, cp_max_resolution=1024),
                 dict(lr=2e-3, encoder_lr_mult=1.0)),
    "cp64_is05": (dict(encoder_type="cp_ipe", ipe_max_deg=12,
                       cp_num_levels=4, cp_level_dim=64,
                       cp_init_scale=0.05,
                       cp_base_resolution=128, cp_max_resolution=1024),
                  dict(lr=2e-3, encoder_lr_mult=4.0)),
    "cp32_anneal": (dict(encoder_type="cp_ipe", ipe_max_deg=12,
                         cp_num_levels=4, cp_level_dim=32,
                         cp_base_resolution=128, cp_max_resolution=1024,
                         cp_anneal_frac=0.15),
                    dict(lr=2e-3, encoder_lr_mult=4.0)),
    # --- run-4: quality levers on the stable F=16 base (42.1 dB) ---
    "cp16_trunk6": (dict(encoder_type="cp_ipe", ipe_max_deg=12,
                         cp_num_levels=4, cp_level_dim=16,
                         cp_base_resolution=128, cp_max_resolution=1024,
                         ipe_density_depth=6, ipe_density_width=384),
                    dict(lr=2e-3, encoder_lr_mult=4.0)),
    "cp16_r2048": (dict(encoder_type="cp_ipe", ipe_max_deg=12,
                        cp_num_levels=5, cp_level_dim=16,
                        cp_base_resolution=128,
                        cp_max_resolution=2048),
                   dict(lr=2e-3, encoder_lr_mult=4.0)),
    "cp16_bw06": (dict(encoder_type="cp_ipe", ipe_max_deg=12,
                       cp_num_levels=4, cp_level_dim=16,
                       cp_bump_width=0.6,
                       cp_base_resolution=128, cp_max_resolution=1024),
                  dict(lr=2e-3, encoder_lr_mult=4.0)),
    "cp16_pair16": (dict(encoder_type="cp_ipe", ipe_max_deg=12,
                         cp_num_levels=4, cp_level_dim=16,
                         cp_pair_dim=16,
                         cp_base_resolution=128, cp_max_resolution=1024),
                    dict(lr=2e-3, encoder_lr_mult=4.0)),
    # --- run-5: feature normalization vs the >=256-dim divergence ---
    "cp64_ln": (dict(encoder_type="cp_ipe", ipe_max_deg=12,
                     cp_num_levels=4, cp_level_dim=64,
                     cp_feature_norm="layernorm",
                     cp_base_resolution=128, cp_max_resolution=1024),
                dict(lr=2e-3, encoder_lr_mult=4.0)),
    "cp16_ln": (dict(encoder_type="cp_ipe", ipe_max_deg=12,
                     cp_num_levels=4, cp_level_dim=16,
                     cp_feature_norm="layernorm",
                     cp_base_resolution=128, cp_max_resolution=1024),
                dict(lr=2e-3, encoder_lr_mult=4.0)),
    "cp_pair_ln": (dict(encoder_type="cp_ipe", ipe_max_deg=12,
                        cp_num_levels=4, cp_level_dim=16,
                        cp_pair_dim=16, cp_feature_norm="layernorm",
                        cp_base_resolution=128, cp_max_resolution=1024),
                   dict(lr=2e-3, encoder_lr_mult=4.0)),
    "cp16_mult8": (dict(encoder_type="cp_ipe", ipe_max_deg=12,
                        cp_num_levels=4, cp_level_dim=16,
                        cp_base_resolution=128, cp_max_resolution=1024),
                   dict(lr=2e-3, encoder_lr_mult=8.0)),
    # --- run-6: F=64 stall isolation (CPU trains fine; TPU stalls) ---
    "cp64_hp": (dict(encoder_type="cp_ipe", ipe_max_deg=12,
                     cp_num_levels=4, cp_level_dim=64,
                     cp_base_resolution=128, cp_max_resolution=1024),
                dict(lr=2e-3, encoder_lr_mult=4.0)),
    "cp64_r256": (dict(encoder_type="cp_ipe", ipe_max_deg=12,
                       cp_num_levels=4, cp_level_dim=64,
                       cp_base_resolution=64, cp_max_resolution=256),
                  dict(lr=2e-3, encoder_lr_mult=4.0)),
    # --- run-7: lr warmup defeats the density-collapse stall (CPU
    # diag: F=64 trains with lr_delay 300 — the reference's own shipped
    # warmup; the protocol's lr_delay=0 was the trigger) ---
    "cp64_warm": (dict(encoder_type="cp_ipe", ipe_max_deg=12,
                       cp_num_levels=4, cp_level_dim=64,
                       cp_base_resolution=128, cp_max_resolution=1024),
                  dict(lr=2e-3, encoder_lr_mult=4.0, lr_delay=300)),
    "cp16_warm": (dict(encoder_type="cp_ipe", ipe_max_deg=12,
                       cp_num_levels=4, cp_level_dim=16,
                       cp_base_resolution=128, cp_max_resolution=1024),
                  dict(lr=2e-3, encoder_lr_mult=4.0, lr_delay=300)),
    "cp_pair_warm": (dict(encoder_type="cp_ipe", ipe_max_deg=12,
                          cp_num_levels=4, cp_level_dim=16,
                          cp_pair_dim=16,
                          cp_base_resolution=128,
                          cp_max_resolution=1024),
                     dict(lr=2e-3, encoder_lr_mult=4.0, lr_delay=300)),
    "cp64_warm_hi": (dict(encoder_type="cp_ipe", ipe_max_deg=12,
                          cp_num_levels=5, cp_level_dim=64,
                          cp_base_resolution=128,
                          cp_max_resolution=2048),
                     dict(lr=2e-3, encoder_lr_mult=4.0, lr_delay=300)),
    # --- run-8: cp + one fine hash level (per-interval query) ---
    "cp_hash_warm": (dict(encoder_type="cp_hash", ipe_max_deg=12,
                          cp_num_levels=4, cp_level_dim=16,
                          cp_base_resolution=128,
                          cp_max_resolution=1024,
                          cp_hash_resolution=2048, cp_hash_log2=19),
                     dict(lr=2e-3, encoder_lr_mult=4.0, lr_delay=300)),
    "cp_hash_nowarm": (dict(encoder_type="cp_hash", ipe_max_deg=12,
                            cp_num_levels=4, cp_level_dim=16,
                            cp_base_resolution=128,
                            cp_max_resolution=1024,
                            cp_hash_resolution=2048, cp_hash_log2=19),
                       dict(lr=2e-3, encoder_lr_mult=4.0)),
    # --- run-9: the run-8 fine level was erf-zeroed (interval spread
    # variance >> 1/2048 cell) — per-sample queries, a 3-level ladder,
    # and a no-spread collapsed variant let fine cells survive ---
    "cp_hash_ms": (dict(encoder_type="cp_hash", ipe_max_deg=12,
                        cp_num_levels=4, cp_level_dim=16,
                        cp_base_resolution=128, cp_max_resolution=1024,
                        cp_hash_resolution=2048, cp_hash_log2=19,
                        cp_hash_per_sample=True),
                   dict(lr=2e-3, encoder_lr_mult=4.0)),
    "cp_hash3_ms": (dict(encoder_type="cp_hash", ipe_max_deg=12,
                         cp_num_levels=4, cp_level_dim=16,
                         cp_base_resolution=128, cp_max_resolution=1024,
                         cp_hash_num_levels=3,
                         cp_hash_base_resolution=512,
                         cp_hash_resolution=2048, cp_hash_log2=19,
                         cp_hash_per_sample=True),
                    dict(lr=2e-3, encoder_lr_mult=4.0)),
    "cp_hash_nospread": (dict(encoder_type="cp_hash", ipe_max_deg=12,
                              cp_num_levels=4, cp_level_dim=16,
                              cp_base_resolution=128,
                              cp_max_resolution=1024,
                              cp_hash_resolution=2048, cp_hash_log2=19,
                              cp_hash_use_spread=False),
                         dict(lr=2e-3, encoder_lr_mult=4.0)),
    "cp_hash3_bw": (dict(encoder_type="cp_hash", ipe_max_deg=12,
                         cp_num_levels=4, cp_level_dim=16,
                         cp_bump_width=0.6,
                         cp_base_resolution=128, cp_max_resolution=1024,
                         cp_hash_num_levels=3,
                         cp_hash_base_resolution=512,
                         cp_hash_resolution=2048, cp_hash_log2=19,
                         cp_hash_per_sample=True),
                    dict(lr=2e-3, encoder_lr_mult=4.0)),
    # --- run-10: run-9 found nospread-collapsed = 42.66 @ 22.1k (the
    # spread term was erf-zeroing the fine level) and 3 per-sample
    # levels = 42.98 @ 2.4k (too slow). Combine: multi-level COLLAPSED
    # nospread = 3-4x ~1M gathers, should hold >=15k rays/s ---
    "cp_hash3_cns": (dict(encoder_type="cp_hash", ipe_max_deg=12,
                          cp_num_levels=4, cp_level_dim=16,
                          cp_base_resolution=128, cp_max_resolution=1024,
                          cp_hash_num_levels=3,
                          cp_hash_base_resolution=512,
                          cp_hash_resolution=2048, cp_hash_log2=19,
                          cp_hash_use_spread=False),
                     dict(lr=2e-3, encoder_lr_mult=4.0)),
    "cp_hash4_cns": (dict(encoder_type="cp_hash", ipe_max_deg=12,
                          cp_num_levels=4, cp_level_dim=16,
                          cp_base_resolution=128, cp_max_resolution=1024,
                          cp_hash_num_levels=4,
                          cp_hash_base_resolution=256,
                          cp_hash_resolution=2048, cp_hash_log2=19,
                          cp_hash_use_spread=False),
                     dict(lr=2e-3, encoder_lr_mult=4.0)),
    "cp_hash3_d8_cns": (dict(encoder_type="cp_hash", ipe_max_deg=12,
                             cp_num_levels=4, cp_level_dim=16,
                             cp_base_resolution=128,
                             cp_max_resolution=1024,
                             cp_hash_num_levels=3,
                             cp_hash_base_resolution=512,
                             cp_hash_resolution=2048, cp_hash_log2=19,
                             cp_hash_level_dim=8,
                             cp_hash_use_spread=False),
                        dict(lr=2e-3, encoder_lr_mult=4.0)),
    "cp_hash3_cns_21": (dict(encoder_type="cp_hash", ipe_max_deg=12,
                             cp_num_levels=4, cp_level_dim=16,
                             cp_base_resolution=128,
                             cp_max_resolution=1024,
                             cp_hash_num_levels=3,
                             cp_hash_base_resolution=512,
                             cp_hash_resolution=2048, cp_hash_log2=21,
                             cp_hash_use_spread=False),
                        dict(lr=2e-3, encoder_lr_mult=4.0)),
    # --- run-11: run-10 showed extra COLLAPSED levels hurt (41.7/41.3
    # vs 42.66 for 1 level — coarse hash duplicates cp + collision
    # noise); push capacity/resolution on the winning 1-level
    # collapsed-nospread base instead ---
    "cns_d8": (dict(encoder_type="cp_hash", ipe_max_deg=12,
                    cp_num_levels=4, cp_level_dim=16,
                    cp_base_resolution=128, cp_max_resolution=1024,
                    cp_hash_resolution=2048, cp_hash_log2=19,
                    cp_hash_level_dim=8, cp_hash_use_spread=False),
               dict(lr=2e-3, encoder_lr_mult=4.0)),
    "cns_r4096": (dict(encoder_type="cp_hash", ipe_max_deg=12,
                       cp_num_levels=4, cp_level_dim=16,
                       cp_base_resolution=128, cp_max_resolution=1024,
                       cp_hash_resolution=4096, cp_hash_log2=19,
                       cp_hash_use_spread=False),
                  dict(lr=2e-3, encoder_lr_mult=4.0)),
    "cns_21": (dict(encoder_type="cp_hash", ipe_max_deg=12,
                    cp_num_levels=4, cp_level_dim=16,
                    cp_base_resolution=128, cp_max_resolution=1024,
                    cp_hash_resolution=2048, cp_hash_log2=21,
                    cp_hash_use_spread=False),
               dict(lr=2e-3, encoder_lr_mult=4.0)),
    "cns_max": (dict(encoder_type="cp_hash", ipe_max_deg=12,
                     cp_num_levels=4, cp_level_dim=16,
                     cp_base_resolution=128, cp_max_resolution=1024,
                     cp_hash_resolution=4096, cp_hash_log2=21,
                     cp_hash_level_dim=8, cp_hash_use_spread=False),
                dict(lr=2e-3, encoder_lr_mult=4.0)),
    # --- run-12: capacity arms flat (run-11); remaining levers on the
    # cns base: train-time stochastic multisample dither (per-sample
    # quality at collapsed cost), lr schedule (hash anchor trains the
    # whole model at 8e-3; cns trunk sits at 2e-3), and a repeat of the
    # frontier arm itself for a run-to-run noise estimate (cp16_col
    # scored 42.12 and 41.68 on identical config+seed) ---
    "cns_dither": (dict(encoder_type="cp_hash", ipe_max_deg=12,
                        cp_num_levels=4, cp_level_dim=16,
                        cp_base_resolution=128, cp_max_resolution=1024,
                        cp_hash_resolution=2048, cp_hash_log2=19,
                        cp_hash_use_spread=False, cp_hash_dither=True),
                   dict(lr=2e-3, encoder_lr_mult=4.0)),
    "cns_lr3": (dict(encoder_type="cp_hash", ipe_max_deg=12,
                     cp_num_levels=4, cp_level_dim=16,
                     cp_base_resolution=128, cp_max_resolution=1024,
                     cp_hash_resolution=2048, cp_hash_log2=19,
                     cp_hash_use_spread=False),
                dict(lr=3e-3, encoder_lr_mult=4.0)),
    "cns_lr4m2": (dict(encoder_type="cp_hash", ipe_max_deg=12,
                       cp_num_levels=4, cp_level_dim=16,
                       cp_base_resolution=128, cp_max_resolution=1024,
                       cp_hash_resolution=2048, cp_hash_log2=19,
                       cp_hash_use_spread=False),
                  dict(lr=4e-3, encoder_lr_mult=2.0)),
    "cns_rep": (dict(encoder_type="cp_hash", ipe_max_deg=12,
                     cp_num_levels=4, cp_level_dim=16,
                     cp_base_resolution=128, cp_max_resolution=1024,
                     cp_hash_resolution=2048, cp_hash_log2=19,
                     cp_hash_use_spread=False),
                dict(lr=2e-3, encoder_lr_mult=4.0)),
    # --- run-13: (a) group-split queries — k contiguous along-ray
    # groups per interval, between collapsed (discards along-ray
    # extent) and per-sample (9x cost); (b) a second fine level ABOVE
    # the CP ceiling (2048+4096 — run-10's extra levels failed because
    # 512/1024 duplicate CP coverage) ---
    "cns_split2": (dict(encoder_type="cp_hash", ipe_max_deg=12,
                        cp_num_levels=4, cp_level_dim=16,
                        cp_base_resolution=128, cp_max_resolution=1024,
                        cp_hash_resolution=2048, cp_hash_log2=19,
                        cp_hash_use_spread=False, cp_hash_split=2),
                   dict(lr=2e-3, encoder_lr_mult=4.0)),
    "cns_split3": (dict(encoder_type="cp_hash", ipe_max_deg=12,
                        cp_num_levels=4, cp_level_dim=16,
                        cp_base_resolution=128, cp_max_resolution=1024,
                        cp_hash_resolution=2048, cp_hash_log2=19,
                        cp_hash_use_spread=False, cp_hash_split=3),
                   dict(lr=2e-3, encoder_lr_mult=4.0)),
    "cns2_4096": (dict(encoder_type="cp_hash", ipe_max_deg=12,
                       cp_num_levels=4, cp_level_dim=16,
                       cp_base_resolution=128, cp_max_resolution=1024,
                       cp_hash_num_levels=2,
                       cp_hash_base_resolution=2048,
                       cp_hash_resolution=4096, cp_hash_log2=19,
                       cp_hash_use_spread=False),
                  dict(lr=2e-3, encoder_lr_mult=4.0)),
    "cns2_4096_split2": (dict(encoder_type="cp_hash", ipe_max_deg=12,
                              cp_num_levels=4, cp_level_dim=16,
                              cp_base_resolution=128,
                              cp_max_resolution=1024,
                              cp_hash_num_levels=2,
                              cp_hash_base_resolution=2048,
                              cp_hash_resolution=4096, cp_hash_log2=19,
                              cp_hash_use_spread=False, cp_hash_split=2),
                         dict(lr=2e-3, encoder_lr_mult=4.0)),
    # --- run-14: split/2-level arms plateaued 42.0-42.5; last levers on
    # cns: IPE degree ceiling (encode is free, PERF.md double-angle
    # study) and pushing BOTH frequency ladders up together ---
    "cns_deg14": (dict(encoder_type="cp_hash", ipe_max_deg=14,
                       cp_num_levels=4, cp_level_dim=16,
                       cp_base_resolution=128, cp_max_resolution=1024,
                       cp_hash_resolution=2048, cp_hash_log2=19,
                       cp_hash_use_spread=False),
                  dict(lr=2e-3, encoder_lr_mult=4.0)),
    "cns_deg16": (dict(encoder_type="cp_hash", ipe_max_deg=16,
                       cp_num_levels=4, cp_level_dim=16,
                       cp_base_resolution=128, cp_max_resolution=1024,
                       cp_hash_resolution=2048, cp_hash_log2=19,
                       cp_hash_use_spread=False),
                  dict(lr=2e-3, encoder_lr_mult=4.0)),
    "cns5_hi": (dict(encoder_type="cp_hash", ipe_max_deg=14,
                     cp_num_levels=5, cp_level_dim=16,
                     cp_base_resolution=128, cp_max_resolution=2048,
                     cp_hash_resolution=4096, cp_hash_log2=19,
                     cp_hash_use_spread=False),
                dict(lr=2e-3, encoder_lr_mult=4.0)),
    "cns_rep2": (dict(encoder_type="cp_hash", ipe_max_deg=12,
                      cp_num_levels=4, cp_level_dim=16,
                      cp_base_resolution=128, cp_max_resolution=1024,
                      cp_hash_resolution=2048, cp_hash_log2=19,
                      cp_hash_use_spread=False),
                 dict(lr=2e-3, encoder_lr_mult=4.0)),
    # --- run-15: replace the fine HASH level with three DENSE 2D
    # planes (models/triplane.py) — a 2048^2 plane has zero collisions
    # where the log2=19 hash under a 2048^3 virtual grid aliases ~16k
    # cells/row; query stays collapsed-nospread (the cns winner), 12
    # gathers/query vs 8 ---
    "tri_cns": (dict(encoder_type="cp_tri", ipe_max_deg=12,
                     cp_num_levels=4, cp_level_dim=16,
                     cp_base_resolution=128, cp_max_resolution=1024,
                     cp_tri_resolution=2048, cp_tri_level_dim=4,
                     cp_hash_use_spread=False),
                dict(lr=2e-3, encoder_lr_mult=4.0)),
    "tri_cns_4096": (dict(encoder_type="cp_tri", ipe_max_deg=12,
                          cp_num_levels=4, cp_level_dim=16,
                          cp_base_resolution=128, cp_max_resolution=1024,
                          cp_tri_resolution=4096, cp_tri_level_dim=4,
                          cp_hash_use_spread=False),
                     dict(lr=2e-3, encoder_lr_mult=4.0)),
    "tri_cns_d8": (dict(encoder_type="cp_tri", ipe_max_deg=12,
                        cp_num_levels=4, cp_level_dim=16,
                        cp_base_resolution=128, cp_max_resolution=1024,
                        cp_tri_resolution=2048, cp_tri_level_dim=8,
                        cp_hash_use_spread=False),
                   dict(lr=2e-3, encoder_lr_mult=4.0)),
    # EMA-of-params at eval (free at train time; zero step cost)
    "cns_ema": (dict(encoder_type="cp_hash", ipe_max_deg=12,
                     cp_num_levels=4, cp_level_dim=16,
                     cp_base_resolution=128, cp_max_resolution=1024,
                     cp_hash_resolution=2048, cp_hash_log2=19,
                     cp_hash_use_spread=False),
                dict(lr=2e-3, encoder_lr_mult=4.0, ema=0.999)),
    "tri_cns_ema": (dict(encoder_type="cp_tri", ipe_max_deg=12,
                         cp_num_levels=4, cp_level_dim=16,
                         cp_base_resolution=128, cp_max_resolution=1024,
                         cp_tri_resolution=2048, cp_tri_level_dim=4,
                         cp_hash_use_spread=False),
                    dict(lr=2e-3, encoder_lr_mult=4.0, ema=0.999)),
    # --- run-16: cns_ema hit 42.95 (EMA 0.999 buys +0.29 over cns's
    # 42.66); decay is the remaining free knob — the warmed decay
    # ramps in over ~1/(1-d) steps, so 0.9995 averages a ~2000-step
    # window of the 1200-step protocol (likely too long), 0.995 a
    # ~200-step window ---
    "cns_ema995": (dict(encoder_type="cp_hash", ipe_max_deg=12,
                        cp_num_levels=4, cp_level_dim=16,
                        cp_base_resolution=128, cp_max_resolution=1024,
                        cp_hash_resolution=2048, cp_hash_log2=19,
                        cp_hash_use_spread=False),
                   dict(lr=2e-3, encoder_lr_mult=4.0, ema=0.995)),
    "cns_ema9995": (dict(encoder_type="cp_hash", ipe_max_deg=12,
                         cp_num_levels=4, cp_level_dim=16,
                         cp_base_resolution=128, cp_max_resolution=1024,
                         cp_hash_resolution=2048, cp_hash_log2=19,
                         cp_hash_use_spread=False),
                    dict(lr=2e-3, encoder_lr_mult=4.0, ema=0.9995)),
    "cns_ema998": (dict(encoder_type="cp_hash", ipe_max_deg=12,
                        cp_num_levels=4, cp_level_dim=16,
                        cp_base_resolution=128, cp_max_resolution=1024,
                        cp_hash_resolution=2048, cp_hash_log2=19,
                        cp_hash_use_spread=False),
                   dict(lr=2e-3, encoder_lr_mult=4.0, ema=0.998)),
    # EMA stacked on the two capacity arms that edged past plain cns
    # (42.68 @ 21.8k and 42.45 @ 17.3k in runs 11/13)
    "cns_max_ema": (dict(encoder_type="cp_hash", ipe_max_deg=12,
                         cp_num_levels=4, cp_level_dim=16,
                         cp_base_resolution=128, cp_max_resolution=1024,
                         cp_hash_resolution=4096, cp_hash_log2=21,
                         cp_hash_level_dim=8, cp_hash_use_spread=False),
                    dict(lr=2e-3, encoder_lr_mult=4.0, ema=0.999)),
    "cns2_4096_ema": (dict(encoder_type="cp_hash", ipe_max_deg=12,
                           cp_num_levels=4, cp_level_dim=16,
                           cp_base_resolution=128, cp_max_resolution=1024,
                           cp_hash_num_levels=2,
                           cp_hash_base_resolution=2048,
                           cp_hash_resolution=4096, cp_hash_log2=19,
                           cp_hash_use_spread=False),
                      dict(lr=2e-3, encoder_lr_mult=4.0, ema=0.999)),
    # --- run-18: capacity unlocks via the run-7 warmup fix (lr_delay
    # 300 defeats the density-collapse stall that killed every >=256-dim
    # encoder at lr_delay=0), stacked with EMA on the winning base ---
    "cns_warm_ema": (dict(encoder_type="cp_hash", ipe_max_deg=12,
                          cp_num_levels=4, cp_level_dim=16,
                          cp_base_resolution=128, cp_max_resolution=1024,
                          cp_hash_resolution=2048, cp_hash_log2=19,
                          cp_hash_use_spread=False),
                     dict(lr=2e-3, encoder_lr_mult=4.0, lr_delay=300,
                          ema=0.999)),
    "cns_f64_warm_ema": (dict(encoder_type="cp_hash", ipe_max_deg=12,
                              cp_num_levels=4, cp_level_dim=64,
                              cp_base_resolution=128,
                              cp_max_resolution=1024,
                              cp_hash_resolution=2048, cp_hash_log2=19,
                              cp_hash_use_spread=False),
                         dict(lr=2e-3, encoder_lr_mult=4.0, lr_delay=300,
                              ema=0.999)),
    "cp64_warm_ema": (dict(encoder_type="cp_ipe", ipe_max_deg=12,
                           cp_num_levels=4, cp_level_dim=64,
                           cp_base_resolution=128, cp_max_resolution=1024),
                      dict(lr=2e-3, encoder_lr_mult=4.0, lr_delay=300,
                           ema=0.999)),
    "cns_pair_warm_ema": (dict(encoder_type="cp_hash", ipe_max_deg=12,
                               cp_num_levels=4, cp_level_dim=16,
                               cp_pair_dim=16,
                               cp_base_resolution=128,
                               cp_max_resolution=1024,
                               cp_hash_resolution=2048, cp_hash_log2=19,
                               cp_hash_use_spread=False),
                          dict(lr=2e-3, encoder_lr_mult=4.0,
                               lr_delay=300, ema=0.999)),
    "cns2_4096_warm_ema": (dict(encoder_type="cp_hash", ipe_max_deg=12,
                                cp_num_levels=4, cp_level_dim=16,
                                cp_base_resolution=128,
                                cp_max_resolution=1024,
                                cp_hash_num_levels=2,
                                cp_hash_base_resolution=2048,
                                cp_hash_resolution=4096, cp_hash_log2=19,
                                cp_hash_use_spread=False),
                           dict(lr=2e-3, encoder_lr_mult=4.0,
                                lr_delay=300, ema=0.999)),
    # --- run-20: low-passed factor init vs the cross-seed droop (the
    # hash arm is seed-stable at 44.0-44.5; the CP arms drop ~1.2 dB on
    # seeds 1-2 — init-luck of the white-noise multiplicative factors).
    # Smoothing the init noise along the resolution axis removes the
    # high-frequency density the bad seeds start with. ---
    "cns_ema_sm4": (dict(encoder_type="cp_hash", ipe_max_deg=12,
                         cp_num_levels=4, cp_level_dim=16,
                         cp_init_smooth=4.0,
                         cp_base_resolution=128, cp_max_resolution=1024,
                         cp_hash_resolution=2048, cp_hash_log2=19,
                         cp_hash_use_spread=False),
                    dict(lr=2e-3, encoder_lr_mult=4.0, ema=0.999)),
    "cns_ema_sm8": (dict(encoder_type="cp_hash", ipe_max_deg=12,
                         cp_num_levels=4, cp_level_dim=16,
                         cp_init_smooth=8.0,
                         cp_base_resolution=128, cp_max_resolution=1024,
                         cp_hash_resolution=2048, cp_hash_log2=19,
                         cp_hash_use_spread=False),
                    dict(lr=2e-3, encoder_lr_mult=4.0, ema=0.999)),
    # smooth init may also lift the lr ceiling (3e-3 diverged white)
    "cns_ema_sm4_lr3": (dict(encoder_type="cp_hash", ipe_max_deg=12,
                             cp_num_levels=4, cp_level_dim=16,
                             cp_init_smooth=4.0,
                             cp_base_resolution=128,
                             cp_max_resolution=1024,
                             cp_hash_resolution=2048, cp_hash_log2=19,
                             cp_hash_use_spread=False),
                        dict(lr=3e-3, encoder_lr_mult=4.0, ema=0.999)),
    # --- run-22: does the capacity curve extend past F=64? (run-20:
    # F=16 plateaus at 44.1, F=64 reaches 45.73 @ 20k steps) ---
    "cns_f128_warm_ema": (dict(encoder_type="cp_hash", ipe_max_deg=12,
                               cp_num_levels=4, cp_level_dim=128,
                               cp_base_resolution=128,
                               cp_max_resolution=1024,
                               cp_hash_resolution=2048, cp_hash_log2=19,
                               cp_hash_use_spread=False),
                          dict(lr=2e-3, encoder_lr_mult=4.0,
                               lr_delay=2000, ema=0.999)),
    "cns_f64_pair_warm_ema": (dict(encoder_type="cp_hash",
                                   ipe_max_deg=12,
                                   cp_num_levels=4, cp_level_dim=64,
                                   cp_pair_dim=16,
                                   cp_base_resolution=128,
                                   cp_max_resolution=1024,
                                   cp_hash_resolution=2048,
                                   cp_hash_log2=19,
                                   cp_hash_use_spread=False),
                              dict(lr=2e-3, encoder_lr_mult=4.0,
                                   lr_delay=2000, ema=0.999)),
}


def run(tag, mdict, scene, dev, lr=2e-3, encoder_lr_mult=1.0,
        lr_delay=0, ema=0.0):
  mcfg = ZipNerfConfig(**mdict, **COMMON)
  tcfg = ZipTrainConfig(batch_size=BATCH, max_steps=STEPS, lr_init=lr,
                        lr_final=lr / 10, lr_delay_steps=lr_delay,
                        lr_delay_mult=1e-3,
                        encoder_lr_mult=encoder_lr_mult, ema_decay=ema)
  cpu = jax.devices("cpu")[0]
  with jax.default_device(cpu):
    model, state = create_zip_train_state(jax.random.PRNGKey(SEED), mcfg,
                                          tcfg)
  state = jax.device_put(state, jax.devices()[0])
  step = make_zip_train_step(model, mcfg, tcfg, dev, scene.i_train,
                             scene.near, scene.far, donate=True)
  key = jax.random.PRNGKey(SEED + 1)
  t0 = time.perf_counter()
  for i in range(1, STEPS + 1):
    key, k = jax.random.split(key)
    state, m = step(state, k)
    if i % 200 == 0:
      loss = float(m["loss"])
      print(f"[{tag} {i}] loss={loss:.5f} "
            f"({time.perf_counter()-t0:.0f}s)", flush=True)
      assert np.isfinite(loss)

  # held-out PSNR on 2 test views, chunked render (EMA params when on)
  from snerf_tpu.data.raygen import rays_for_image
  from snerf_tpu.train.zip_trainer import eval_params
  rparams = eval_params(state)
  psnrs = []
  fn = jax.jit(lambda p, r: model.apply({"params": p}, r,
                                        rng=None)[0][-1]["rgb"])
  for ti in np.asarray(scene.i_test)[:2]:
    rays = rays_for_image(jnp.asarray(scene.poses[ti]),
                          jnp.asarray(scene.intrinsics[ti]),
                          scene.hw[0], scene.hw[1], scene.near, scene.far)
    flat = jax.tree_util.tree_map(
        lambda x: x.reshape(-1, x.shape[-1]), rays)
    n = flat.origins.shape[0]
    outs = []
    for s in range(0, n, 4096):
      chunk = jax.tree_util.tree_map(lambda x: x[s:s + 4096], flat)
      outs.append(np.asarray(fn(rparams, chunk)))
    pred = np.concatenate(outs).reshape(*scene.hw, 3)
    gt = scene.images[ti].astype(np.float32) / 255.0
    mse = float(np.mean((pred - gt) ** 2))
    psnrs.append(-10 * np.log10(mse))
  print(f"RESULT {tag}: held-out psnr = {np.mean(psnrs):.2f} dB "
        f"({time.perf_counter()-t0:.0f}s total)", flush=True)
  return float(np.mean(psnrs))


def measure_ref_budget_rays(tag, mdict, scene, dev):
  """Steady-state rays/s of the train step at the reference budget."""
  mcfg = ZipNerfConfig(
      **{**mdict,
         "num_prop_samples": (64, 64), "num_nerf_samples": 32,
         "sample_n": 7, "raydist_fn": "power_transformation"})
  tcfg = ZipTrainConfig(batch_size=4096, max_steps=1000)
  cpu = jax.devices("cpu")[0]
  with jax.default_device(cpu):
    model, state = create_zip_train_state(jax.random.PRNGKey(0), mcfg,
                                          tcfg)
  state = jax.device_put(state, jax.devices()[0])
  step = make_zip_train_step(model, mcfg, tcfg, dev, scene.i_train,
                             scene.near, scene.far, donate=True)
  key = jax.random.PRNGKey(1)
  state, m = step(state, key)          # compile
  float(m["loss"])
  t0 = time.perf_counter()
  n_steps = 10
  for i in range(n_steps):
    key, k = jax.random.split(key)
    state, m = step(state, k)
  float(m["loss"])                     # force through dependency chain
  dt = (time.perf_counter() - t0) / n_steps
  rps = 4096 / dt
  print(f"REFBUDGET {tag}: {dt*1e3:.1f} ms/step = {rps:,.0f} rays/s",
        flush=True)
  return rps


def main():
  arms = sys.argv[1:] or ["cp", "cp_ipe", "ipe_anneal"]
  scene = make_synthetic_scene(num_images=24, H=192, W=256, datahold=8)
  dev = scene_to_device(scene)
  results = {}
  for a in arms:
    mdict, rkw = ARMS[a]
    psnr = run(a, mdict, scene, dev, **rkw)
    rps = (0.0 if SKIP_REFBUDGET
           else measure_ref_budget_rays(a, mdict, scene, dev))
    results[a] = (psnr, rps)
  print("\n=== summary (target: >=43 dB and >=10k rays/s) ===")
  for a, (p, r) in results.items():
    print(f"  {a:12s}  {p:6.2f} dB   {r:10,.0f} rays/s")


if __name__ == "__main__":
  main()
