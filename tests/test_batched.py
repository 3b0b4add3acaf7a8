"""Batched multi-sequence replay (interleaved multi-stream): B streams
must each track their own ground truth, and a stream must match the
single-pipeline replay exactly (the streams are genuinely independent
pipelines, so any cross-talk is a bug)."""

import numpy as np

from fast_livo2_tpu.core.pipeline import LIVOPipeline
from fast_livo2_tpu.io import synthetic
from fast_livo2_tpu.parallel.batch import MultiStreamReplay
from tests.test_pipeline_lio import small_config


def _make_seqs():
    trajs_cfg = [
        synthetic.Trajectory(),
        synthetic.Trajectory(pos_amp=np.array([0.8, 1.6, 0.2]),
                             yaw_rate=-0.2),
    ]
    return [
        synthetic.make_sequence(duration=3.0, lidar_hz=10.0, imu_hz=200.0,
                                seed=s, n_lines=12, n_per_line=500,
                                render=False, fov_deg=360.0, traj=tc)
        for s, tc in zip([0, 11], trajs_cfg)
    ]


def test_multistream_tracks_each_sequence():
    seqs = _make_seqs()
    bp = MultiStreamReplay(small_config(), batch=2, slam_mode="only_lio")
    trajs = bp.process(seqs)
    assert len(trajs) == 2 and len(trajs[0]) >= 10
    assert bp.n_frames > 0 and bp.wall_s > 0
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


def test_multistream_matches_single_pipeline():
    seqs = _make_seqs()
    bp = MultiStreamReplay(small_config(), batch=2, slam_mode="only_lio")
    trajs = bp.process(seqs)
    ref = LIVOPipeline(small_config(), slam_mode="only_lio")
    traj_ref = ref.process(seqs[0])
    assert len(trajs[0]) == len(traj_ref)
    for (t0, R0, p0), (t1, R1, p1) in zip(traj_ref, trajs[0]):
        assert t0 == t1
        np.testing.assert_allclose(p0, p1, atol=1e-6)
