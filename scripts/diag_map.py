"""Voxel-map topology + match-quality diagnostics (VERDICT r4 item 1).

Runs the outdoor benchmark clip (the MARS_LVIG 2 m-voxel operating
point, tests/test_long_run.py::_outdoor_seq) and reports the
instrumentation the 2 m-voxel investigation needs:

  - ATE / drift of the run;
  - per-layer map census: occupied voxels, solid planes (ISPL=1),
    marginal planes (0.75), CUT internal nodes (-1), frozen voxels —
    i.e. how far the layered descent actually subdivided;
  - per-match layer histogram: ground-truth-posed scan points matched
    against the FINAL map (match_planes), counted by winning candidate
    (own-chain layer / neighbor), with |point-to-plane| residual stats
    per layer — plane-fit quality vs voxel size, directly.

Usage:
  python scripts/diag_map.py [--voxel 2.0] [--no-sticky] [--margin 1.0]
                             [--seed 32] [--duration 20]

A/B the r5 topology fix against the r4 behavior with
  python scripts/diag_map.py                 # sticky cut + pre-descend
  python scripts/diag_map.py --no-sticky --margin 1.0   # r4 behavior
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np

import fast_livo2_tpu

fast_livo2_tpu.enable_compile_cache()

import jax.numpy as jnp

from fast_livo2_tpu.core import voxel_map as vm
from fast_livo2_tpu.core.lio import calc_body_cov
from fast_livo2_tpu.core.pipeline import LIVOPipeline
from fast_livo2_tpu.io import synthetic
from fast_livo2_tpu.utils.config import LIVOConfig


def outdoor_seq(seed, duration):
    wp = synthetic.long_outdoor_waypoints()
    traj = synthetic.WaypointTrajectory(wp, duration=44.0)
    return synthetic.make_sequence(
        duration=duration, lidar_hz=10.0, imu_hz=200.0, seed=seed,
        n_lines=24, n_per_line=1000, render=False, fov_deg=360.0,
        planes=synthetic.long_outdoor_scene(), traj=traj, max_range=80.0,
        gyr_noise=2e-3, acc_noise=2e-2, range_noise=0.03,
        bias_g=np.array([0.002, -0.0015, 0.001]),
        bias_a=np.array([0.05, -0.03, 0.08]))


def census(pipe):
    """Per-layer topology counts from the live map."""
    rec = np.asarray(vm.derive_rec(pipe.vmap_state, pipe.map_cfg))
    keys = np.asarray(pipe.vmap_state.keys)
    rows = []
    for l in range(rec.shape[0]):
        occ = keys[l, :, 0] != vm.EMPTY
        col = rec[l, :, vm._ISPL]
        cnt = rec[l, :, vm._CNT]
        rows.append(dict(
            layer=l,
            occupied=int(occ.sum()),
            solid=int(((col > 0.9) & occ).sum()),
            marginal=int((np.isclose(col, 0.75) & occ).sum()),
            cut=int(((col < -0.5) & occ).sum()),
            undecided=int(((np.abs(col) < 0.1) & occ).sum()),
            frozen=int(((cnt >= pipe.map_cfg.max_points_num) & occ).sum()),
        ))
    return rows


def _gt_world_points(seq, fi, max_pts=4096):
    """Undistorted world points of scan fi using per-point GT posing
    (ground-truth interpolated at each point's own stamp — filter-free)."""
    gt_t = np.array([g[0] for g in seq.gt])
    gt_R = np.array([g[1] for g in seq.gt])
    gt_p = np.array([g[2] for g in seq.gt])
    t0, pts, offs = seq.scans[fi]
    step = max(1, len(pts) // max_pts)
    sub, so = pts[::step][:max_pts], offs[::step][:max_pts]
    ts = t0 + so
    gi = np.clip(np.searchsorted(gt_t, ts), 1, len(gt_t) - 1)
    w = np.clip((ts - gt_t[gi - 1])
                / np.maximum(gt_t[gi] - gt_t[gi - 1], 1e-9), 0, 1)
    p = gt_p[gi - 1] * (1 - w[:, None]) + gt_p[gi] * w[:, None]
    R = gt_R[gi]  # nearest rotation: rotational smear << range noise here
    pts_w = np.einsum("nij,nj->ni", R, sub) + p
    return sub, pts_w


def match_histogram(vmap_state, map_cfg, frames, label):
    """Winning-layer histogram + |residual| stats for (body, world)
    point sets against a map."""
    L = map_cfg.n_layers
    hist = np.zeros(L + 2, np.int64)  # layers, neighbor, unmatched
    res = [[] for _ in range(L + 1)]
    for sub, pts_w in frames:
        var6 = vm.sym6(calc_body_cov(jnp.asarray(sub), 0.02, 0.05))
        m = vm.match_planes(vmap_state, jnp.asarray(pts_w), var6,
                            jnp.ones(len(sub), bool), map_cfg)
        lay = np.asarray(m.layer)
        dist = np.abs(np.asarray(m.dist))
        ok = np.asarray(m.valid)
        for l in range(L + 1):
            sel = ok & (lay == l)
            hist[l] += int(sel.sum())
            if sel.any():
                res[l].append(dist[sel])
        hist[L + 1] += int((~ok).sum())
    out = []
    for l in range(L + 1):
        r = np.concatenate(res[l]) if res[l] else np.array([0.0])
        name = f"layer{l}" if l < L else "neighbor"
        out.append(dict(cand=name, matches=int(hist[l]),
                        res_mean_cm=round(float(r.mean()) * 100, 2),
                        res_p90_cm=round(float(np.percentile(r, 90)) * 100, 2)))
    out.append(dict(cand="unmatched", matches=int(hist[L + 1]),
                    res_mean_cm=0.0, res_p90_cm=0.0))
    print(f"== {label}")
    for row in out:
        print("  ", row)
    return out


def gt_map_quality(seq, map_cfg, n_build=60, n_probe=8):
    """Filter-independent plane-fit quality: build a fresh map from
    GT-posed scans (even frames), then match GT-posed points of held-out
    odd frames — per-layer match share and residuals measure what the
    topology/fit produces at this voxel size, with zero filter drift in
    the loop."""
    m = vm.make_map(map_cfg)
    upd = None
    build_idx = np.linspace(0, len(seq.scans) - 1, n_build).astype(int)
    import jax

    for fi in build_idx:
        sub, pts_w = _gt_world_points(seq, fi)
        var6 = vm.sym6(calc_body_cov(jnp.asarray(sub), 0.02, 0.05))
        if upd is None:
            upd = jax.jit(lambda mm, pw, v6: vm.update_map(
                mm, pw, v6, jnp.ones(pw.shape[0], bool), map_cfg))
        m = upd(m, jnp.asarray(pts_w), var6)
    probe_idx = (np.linspace(0, len(seq.scans) - 2, n_probe).astype(int)
                 | 1)  # odd frames: held out of the build set
    frames = [_gt_world_points(seq, fi) for fi in probe_idx]
    return m, frames


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--voxel", type=float, default=2.0)
    ap.add_argument("--layers", type=int, default=3)
    ap.add_argument("--no-sticky", action="store_true")
    ap.add_argument("--margin", type=float, default=None)
    ap.add_argument("--seed", type=int, default=32)
    ap.add_argument("--duration", type=float, default=20.0)
    args = ap.parse_args()

    seq = outdoor_seq(args.seed, args.duration)

    cfg = LIVOConfig()
    cfg.tpu.max_points_per_scan = 16384
    cfg.tpu.max_points_down = 8192
    cfg.tpu.hash_capacity_log2 = 16
    cfg.lio.voxel_size = args.voxel
    cfg.lio.max_layer = args.layers - 1
    cfg.preprocess.filter_size_surf = 0.5
    cfg.local_map.map_sliding_en = True
    cfg.local_map.half_map_size = 50
    cfg.local_map.sliding_thresh = 8.0
    cfg.tpu.sticky_cut = not args.no_sticky
    if args.margin is not None:
        cfg.tpu.pre_descend_margin = args.margin

    t0 = time.time()
    pipe = LIVOPipeline(cfg, slam_mode="only_lio")
    tr = pipe.process(seq, progress=False)
    wall = time.time() - t0
    rmse = synthetic.ate_rmse([(t, p) for t, _, p in tr], seq.gt)
    gt_p = np.array([g[2] for g in seq.gt])
    path = float(np.sum(np.linalg.norm(np.diff(gt_p, axis=0), axis=1)))

    print(f"== run: voxel={args.voxel} layers={args.layers} "
          f"sticky={cfg.tpu.sticky_cut} margin={cfg.tpu.pre_descend_margin} "
          f"seed={args.seed}")
    print(f"   frames={len(tr)} wall={wall:.0f}s ATE={rmse:.3f} m "
          f"drift={100 * rmse / path:.2f}% of {path:.0f} m")
    print("== map census (final, from the run)")
    for row in census(pipe):
        print("  ", row)
    # Filter-independent plane-fit quality: GT-built map, held-out GT
    # probes — isolates topology/fit behavior from filter drift.
    gt_map, probes = gt_map_quality(seq, pipe.map_cfg)
    match_histogram(gt_map, pipe.map_cfg, probes,
                    "GT-built map vs held-out GT probes")
    rec = np.asarray(vm.derive_rec(gt_map, pipe.map_cfg))
    keys = np.asarray(gt_map.keys)
    print("== GT-built map census")
    for l in range(rec.shape[0]):
        occ = keys[l, :, 0] != vm.EMPTY
        col = rec[l, :, vm._ISPL]
        print(f"   layer {l}: occ={int(occ.sum())} "
              f"solid={int(((col > 0.9) & occ).sum())} "
              f"marginal={int((np.isclose(col, 0.75) & occ).sum())} "
              f"cut={int(((col < -0.5) & occ).sum())} "
              f"undecided={int(((np.abs(col) < 0.1) & occ).sum())}")


if __name__ == "__main__":
    main()
