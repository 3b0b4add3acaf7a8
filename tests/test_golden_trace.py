"""Golden-trace regression (SURVEY.md §4 consequence (b)): the ONLY_LIO
trajectory on a fixed synthetic sequence must match the committed golden
within tight tolerance — catches silent numerical regressions in any
filter-path change. Regenerate with:
    python scripts/gen_golden.py
"""

import os

import numpy as np

from fast_livo2_tpu.core.pipeline import LIVOPipeline
from fast_livo2_tpu.io import synthetic
from tests.test_pipeline_lio import small_config

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "lio_traj.npz")


def _run():
    seq = synthetic.make_sequence(
        duration=2.4, lidar_hz=10.0, imu_hz=200.0, seed=7,
        n_lines=12, n_per_line=500, render=False, fov_deg=360.0,
    )
    pipe = LIVOPipeline(small_config(), slam_mode="only_lio")
    traj = pipe.process(seq)
    ts = np.array([t for t, _, _ in traj])
    ps = np.array([p for _, _, p in traj])
    Rs = np.array([R for _, R, _ in traj])
    return ts, ps, Rs


def test_trajectory_matches_golden():
    assert os.path.exists(GOLDEN), "golden missing — run scripts/gen_golden.py"
    g = np.load(GOLDEN)
    ts, ps, Rs = _run()
    np.testing.assert_allclose(ts, g["ts"], atol=1e-6)
    # Position to sub-centimeter, attitude to ~0.2 deg: loose enough for
    # cross-backend float noise, tight enough to catch logic changes.
    np.testing.assert_allclose(ps, g["ps"], atol=8e-3)
    np.testing.assert_allclose(Rs, g["Rs"], atol=4e-3)
