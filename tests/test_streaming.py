"""Streaming ingestion API (push/poll) + IMU-rate odometry
(VERDICT round-1 item 8): packets fed incrementally must reproduce the
offline replay exactly, events must wait for their input streams, and
poses must be pollable at IMU rate between two frame updates
(imu_prop_callback, LIVMapper.cpp:576-635)."""

import numpy as np
import pytest

from fast_livo2_tpu.core.pipeline import LIVOPipeline
from fast_livo2_tpu.io import synthetic
from fast_livo2_tpu.utils.config import LIVOConfig


@pytest.fixture(scope="module")
def seq():
    return synthetic.make_sequence(
        duration=2.5, lidar_hz=10.0, imu_hz=200.0, seed=0,
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


def _stream(pipe, seq, chunk_s=0.3):
    """Feed the sequence in wall-clock chunks, polling after each."""
    t_max = max(seq.imu_stamps[-1],
                max(t + (o[-1] if len(o) else 0) for t, _, o in seq.scans))
    t = 0.0
    si = ii = 0
    frames = 0
    while t < t_max + chunk_s:
        t += chunk_s
        while si < len(seq.scans) and seq.scans[si][0] + (
                seq.scans[si][2][-1] if len(seq.scans[si][2]) else 0) <= t:
            tb, pts, offs = seq.scans[si]
            pipe.push_scan(tb, pts, offs)
            si += 1
        j = np.searchsorted(seq.imu_stamps, t)
        if j > ii:
            pipe.push_imu(seq.imu_stamps[ii:j], seq.imu_gyr[ii:j],
                          seq.imu_acc[ii:j])
            ii = j
        frames += pipe.poll()
    frames += pipe.poll(flush=True)
    return frames


def test_streaming_matches_offline_replay(seq):
    ref = LIVOPipeline(small_config(), slam_mode="only_lio")
    traj_ref = ref.process(seq)

    pipe = LIVOPipeline(small_config(), slam_mode="only_lio")
    n = _stream(pipe, seq)
    pipe._finalize_host_views()
    traj = pipe.trajectory

    assert n == len(traj) == len(traj_ref)
    for (t0, R0, p0), (t1, R1, p1) in zip(traj_ref, traj):
        assert t0 == t1
        np.testing.assert_allclose(p0, p1, atol=1e-5)
        np.testing.assert_allclose(R0, R1, atol=1e-5)


def test_poll_waits_for_imu_coverage(seq):
    """An event must not fire until IMU samples extend past its cut time
    (the sync_packages wait condition)."""
    pipe = LIVOPipeline(small_config(), slam_mode="only_lio")
    for tb, pts, offs in seq.scans:
        pipe.push_scan(tb, pts, offs)
    # IMU only up to 1.0 s: events beyond must wait
    m = seq.imu_stamps <= 1.0
    pipe.push_imu(seq.imu_stamps[m], seq.imu_gyr[m], seq.imu_acc[m])
    n1 = pipe.poll()
    events_left = len(pipe._scan_events)
    assert events_left > 0  # tail still queued
    pipe.push_imu(seq.imu_stamps[~m], seq.imu_gyr[~m], seq.imu_acc[~m])
    n2 = pipe.poll()
    assert n2 > 0
    ref = LIVOPipeline(small_config(), slam_mode="only_lio")
    assert n1 + n2 == len(ref.process(seq))


def test_imu_rate_poses_between_updates(seq):
    """Pull IMU-rate poses between two frame updates: they start at the
    last posterior, advance at the IMU period, and stay near ground
    truth over the short horizon."""
    pipe = LIVOPipeline(small_config(), slam_mode="only_lio")
    for tb, pts, offs in seq.scans:
        pipe.push_scan(tb, pts, offs)
    pipe.push_imu(seq.imu_stamps, seq.imu_gyr, seq.imu_acc)
    pipe.poll(max_frames=8)
    t_last = pipe.last_update_time
    assert pipe.frame_id >= 5

    out = pipe.imu_rate_poses(t_until=t_last + 0.1)  # one frame gap
    assert len(out) >= 15  # ~200 Hz over 100 ms
    ts = np.array([t for t, _, _, _ in out])
    assert (np.diff(ts) > 0).all() and ts[0] > t_last and ts[-1] <= t_last + 0.1
    np.testing.assert_allclose(np.median(np.diff(ts)), 1 / 200.0, rtol=0.2)
    # each pose near interpolated ground truth (propagation-only error
    # over <=100 ms is millimetric on exact IMU)
    gt_t = np.array([g[0] for g in seq.gt])
    gt_p = np.array([g[2] for g in seq.gt])
    for t, R, p, v in out:
        i = np.clip(np.searchsorted(gt_t, t), 1, len(gt_t) - 1)
        w = (t - gt_t[i - 1]) / (gt_t[i] - gt_t[i - 1])
        p_gt = gt_p[i - 1] * (1 - w) + gt_p[i] * w
        assert np.linalg.norm(p - p_gt) < 0.05


def test_imu_rate_trajectory_via_config(seq):
    """uav/imu_rate_odom=true fills imu_rate_trajectory during process()
    with poses strictly between frame updates."""
    cfg = small_config()
    cfg.uav.imu_rate_odom = True
    pipe = LIVOPipeline(cfg, slam_mode="only_lio")
    traj = pipe.process(seq)
    assert len(pipe.imu_rate_trajectory) > 5 * len(traj)
    ts = np.array([t for t, _, _ in pipe.imu_rate_trajectory])
    assert (np.diff(ts) > 0).all()
