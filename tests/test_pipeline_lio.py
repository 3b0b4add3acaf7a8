"""End-to-end ONLY_LIO regression on a synthetic sequence: the pipeline
must track the ground-truth trajectory to centimeter ATE (SURVEY.md §4
consequence (c): trajectory-accuracy gates are the reference's only
systemic test; here against exact synthetic ground truth)."""

import numpy as np
import pytest

from fast_livo2_tpu.core.pipeline import LIVOPipeline
from fast_livo2_tpu.io import synthetic
from fast_livo2_tpu.utils.config import LIVOConfig


@pytest.fixture(scope="module")
def seq():
    return synthetic.make_sequence(
        duration=3.0, lidar_hz=10.0, imu_hz=200.0, seed=0,
        n_lines=12, n_per_line=500, render=False, fov_deg=360.0,
    )


def small_config():
    cfg = LIVOConfig()
    cfg.tpu.max_points_per_scan = 8192
    cfg.tpu.max_points_down = 4096
    cfg.tpu.hash_capacity_log2 = 15
    cfg.lio.max_layer = 1
    cfg.preprocess.filter_size_surf = 0.15
    return cfg


def test_only_lio_tracks_synthetic_groundtruth(seq):
    pipe = LIVOPipeline(small_config(), slam_mode="only_lio")
    traj = pipe.process(seq)
    assert len(traj) >= 20
    est = [(t, p) for t, R, p in traj]
    rmse = synthetic.ate_rmse(est, seq.gt)
    # centimeter-level tracking on the synthetic room
    assert rmse < 0.05, f"ATE RMSE {rmse:.3f} m"
    # sanity: the trajectory actually moves (the room walk spans meters)
    span = np.ptp(np.array([p for _, p in est]), axis=0)
    assert span.max() > 0.5


def test_lio_effective_points_nonzero(seq):
    pipe = LIVOPipeline(small_config(), slam_mode="only_lio")
    pipe.process(seq, max_frames=5)
    effs = [r["n_eff"] for r in pipe.log.rows if r["n_eff"] > 0]
    assert effs and np.mean(effs) > 300


def test_only_lo_mode_runs():
    """IMU-less constant-velocity mode (Forward_without_imu path): slower
    drift tolerated, but the pipeline must run and stay bounded on the
    (gentle) synthetic room."""
    seq = synthetic.make_sequence(
        duration=2.0, lidar_hz=10.0, imu_hz=200.0, seed=2,
        n_lines=12, n_per_line=500, render=False, fov_deg=360.0,
    )
    pipe = LIVOPipeline(small_config(), slam_mode="only_lo")
    traj = pipe.process(seq)
    assert len(traj) >= 15
    est = [(t, p) for t, R, p in traj]
    rmse = synthetic.ate_rmse(est, seq.gt)
    assert rmse < 0.5, f"LO ATE RMSE {rmse:.3f} m"


def test_sensor_dropout_robustness():
    """Empty LiDAR packets (sensor dropout) must not corrupt the filter:
    the update degrades to pure propagation (the reference's empty-cloud
    guards, LIVMapper.cpp:343-347)."""
    seq = synthetic.make_sequence(
        duration=3.0, lidar_hz=10.0, imu_hz=200.0, seed=4,
        n_lines=12, n_per_line=500, render=False, fov_deg=360.0,
    )
    # drop all scans in a 0.5 s window mid-sequence
    seq.scans = [
        (t, p, o) if not (1.5 < t < 2.0)
        else (t, p[:0], o[:0])
        for t, p, o in seq.scans
    ]
    pipe = LIVOPipeline(small_config(), slam_mode="only_lio")
    traj = pipe.process(seq)
    p_arr = np.array([p for _, _, p in traj])
    assert np.isfinite(p_arr).all()
    est = [(t, p) for t, R, p in traj]
    rmse = synthetic.ate_rmse(est, seq.gt)
    assert rmse < 0.12, f"dropout ATE {rmse:.3f}"
