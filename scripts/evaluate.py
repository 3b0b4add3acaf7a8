#!/usr/bin/env python3
"""Trajectory evaluation: ATE RMSE with SE(3)/Sim(3) alignment.

Equivalent of the reference's evo_ape recipe
(Log/result/ntu_viral/evaluate_viral.py + README): associates estimated
and ground-truth TUM trajectories by timestamp, aligns with the Umeyama
closed form, and reports APE statistics. Also provides the NTU-VIRAL
body->prism-marker conversion the reference harness applies before
comparison (evaluate_viral.py:6-35: ground truth tracks a prism at a
fixed body offset).

Usage:
  python scripts/evaluate.py est.txt gt.txt [--no-align] [--prism-offset x y z]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def associate(est_t, gt_t, max_dt=0.02):
    """Nearest-timestamp association. Returns index pairs."""
    pairs = []
    j = 0
    for i, t in enumerate(est_t):
        j = np.searchsorted(gt_t, t)
        best, bd = -1, max_dt
        for k in (j - 1, j):
            if 0 <= k < len(gt_t) and abs(gt_t[k] - t) <= bd:
                best, bd = k, abs(gt_t[k] - t)
        if best >= 0:
            pairs.append((i, best))
    return pairs


def umeyama(src, dst, with_scale=False):
    """Closed-form alignment dst ≈ s R src + t."""
    mu_s, mu_d = src.mean(0), dst.mean(0)
    xs, xd = src - mu_s, dst - mu_d
    cov = xd.T @ xs / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    s = (D * S.diagonal()).sum() / xs.var(0).sum() if with_scale else 1.0
    t = mu_d - s * R @ mu_s
    return s, R, t


def ape(est, gt, align=True, prism_offset=None, max_dt=0.02):
    """est/gt: lists [(t, R, p)]. Returns dict of APE stats (meters)."""
    if prism_offset is not None:
        off = np.asarray(prism_offset)
        est = [(t, R, p + R @ off) for t, R, p in est]
    est_t = np.array([e[0] for e in est])
    gt_t = np.array([g[0] for g in gt])
    pairs = associate(est_t, gt_t, max_dt)
    if len(pairs) < 3:
        raise ValueError(f"only {len(pairs)} associations")
    P_est = np.array([est[i][2] for i, _ in pairs])
    P_gt = np.array([gt[j][2] for _, j in pairs])
    if align:
        s, R, t = umeyama(P_est, P_gt)
        P_est = (s * (R @ P_est.T)).T + t
    err = np.linalg.norm(P_est - P_gt, axis=1)
    return {
        "rmse": float(np.sqrt(np.mean(err**2))),
        "mean": float(err.mean()),
        "median": float(np.median(err)),
        "max": float(err.max()),
        "n": len(err),
    }


def main():
    from fast_livo2_tpu.io.export import read_tum

    ap = argparse.ArgumentParser()
    ap.add_argument("est")
    ap.add_argument("gt")
    ap.add_argument("--no-align", action="store_true")
    ap.add_argument("--prism-offset", nargs=3, type=float, default=None,
                    help="body->prism offset (NTU-VIRAL: 0.0 0.0 0.25 per "
                         "the reference harness)")
    ap.add_argument("--max-dt", type=float, default=0.02)
    args = ap.parse_args()
    stats = ape(read_tum(args.est), read_tum(args.gt), align=not args.no_align,
                prism_offset=args.prism_offset, max_dt=args.max_dt)
    for k, v in stats.items():
        print(f"{k:>8}: {v:.4f}" if isinstance(v, float) else f"{k:>8}: {v}")


if __name__ == "__main__":
    main()
