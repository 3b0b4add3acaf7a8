"""Batched multi-sequence replay: B sequences in lockstep must each track
their own ground truth."""

import numpy as np
import pytest

from fast_livo2_tpu.io import synthetic
from fast_livo2_tpu.parallel.batch import BatchedPipeline
from tests.test_pipeline_lio import small_config


def test_batched_lio_tracks_each_sequence():
    B = 2
    import numpy as _np

    trajs_cfg = [
        synthetic.Trajectory(),
        synthetic.Trajectory(pos_amp=_np.array([0.8, 1.6, 0.2]),
                             yaw_rate=-0.2),
    ]
    seqs = [
        synthetic.make_sequence(duration=3.0, lidar_hz=10.0, imu_hz=200.0,
                                seed=s, n_lines=12, n_per_line=500,
                                render=False, fov_deg=360.0, traj=tc)
        for s, tc in zip([0, 11], trajs_cfg)
    ]
    bp = BatchedPipeline(small_config(), batch=B, slam_mode="only_lio")
    trajs = bp.process(seqs)
    assert len(trajs) == B and len(trajs[0]) >= 10
    for b, seq in enumerate(seqs):
        est = [(t, p) for t, R, p in trajs[b]]
        rmse = synthetic.ate_rmse(est, seq.gt)
        assert rmse < 0.08, f"seq {b}: ATE {rmse:.3f}"
    # different seeds -> genuinely different trajectories tracked
    d = np.linalg.norm(
        np.array([p for _, _, p in trajs[0]])
        - np.array([p for _, _, p in trajs[1]]), axis=-1,
    )
    assert d.max() > 0.2
