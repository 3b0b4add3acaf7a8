"""Eval-harness reconciliation gate: scripts/evaluate.py must reproduce
the reference's published NTU-VIRAL ATE table on the reference's own
committed trajectory pairs (Log/result/ntu_viral/README.md:14-24,
recipe `evo_ape tum <gt> <est> -a`). This anchors every parity claim
the engine makes: if the harness drifts from evo's convention, this
fails before any pipeline ATE number is trusted."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from evaluate import ape  # noqa: E402

GOLDEN_DIR = Path("/root/reference/Log/result/ntu_viral")

# README.md:14-24 (cm)
PUBLISHED = {
    "eee_01": 2.71, "eee_02": 2.11, "eee_03": 2.61,
    "nya_01": 3.56, "nya_02": 3.39, "nya_03": 3.52,
    "sbs_01": 2.34, "sbs_02": 2.83, "sbs_03": 3.11,
}


def _read_tum(path):
    d = np.loadtxt(path)
    return [(row[0], None, row[1:4]) for row in d]


@pytest.mark.skipif(not GOLDEN_DIR.exists(), reason="reference goldens absent")
@pytest.mark.parametrize("seq", sorted(PUBLISHED))
def test_published_table_reproduced(seq):
    gt = _read_tum(GOLDEN_DIR / f"{seq}_gt.txt")
    est = _read_tum(GOLDEN_DIR / f"{seq}_prism.txt")
    stats = ape(gt, est, align=True)
    rmse_cm = stats["rmse"] * 100.0
    # published numbers are rounded to 0.01 cm; allow 0.02 cm slack
    assert abs(rmse_cm - PUBLISHED[seq]) <= 0.02, (
        f"{seq}: harness {rmse_cm:.3f} cm vs published {PUBLISHED[seq]} cm")


def test_rpe_known_error_scale():
    """RPE harness sanity (r3 addition: evo_rpe-convention translational
    RPE + drift %): a constant-velocity trajectory with positions scaled
    by (1+eps) has relative translation error exactly eps*v*delta, and a
    perfect estimate has RPE 0."""
    from evaluate import rpe

    v, eps, dur = 2.0, 0.03, 10.0
    ts = np.arange(0.0, dur, 0.1)
    I = np.eye(3)
    ref = [(t, I, np.array([v * t, 0.0, 0.0])) for t in ts]
    est_perfect = [(t, I, np.array([v * t, 0.0, 0.0])) for t in ts]
    est_scaled = [(t, I, np.array([(1 + eps) * v * t, 0.0, 0.0]))
                  for t in ts]

    s0 = rpe(ref, est_perfect, delta=1.0)
    assert s0["rpe_rmse"] < 1e-12
    np.testing.assert_allclose(s0["path_m"], v * (dur - 0.1), rtol=1e-6)

    s1 = rpe(ref, est_scaled, delta=1.0)
    # segment length snaps to the stamp grid (1.0-1.1 s), so the error
    # is eps*v*delta_actual in [0.060, 0.066]
    assert eps * v * 1.0 - 1e-9 <= s1["rpe_rmse"] <= eps * v * 1.1 + 1e-9
    assert s1["drift_pct"] > 0
