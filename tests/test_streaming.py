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


def test_streaming_livo_with_images_matches_offline():
    """LIVO-mode streaming: images + scans + IMU pushed in time order,
    image events held until LiDAR covers the capture time, trajectory
    matches the offline replay."""
    from fast_livo2_tpu.models import camera as cam_mod
    from fast_livo2_tpu.utils.config import CameraConfig

    cam_cfg = CameraConfig(cam_model="Pinhole", cam_width=320,
                           cam_height=256, scale=1.0, cam_fx=200.0,
                           cam_fy=200.0, cam_cx=160.0, cam_cy=128.0)
    cam = cam_mod.make_camera(cam_cfg)
    lseq = synthetic.make_sequence(
        duration=2.0, lidar_hz=10.0, img_hz=10.0, imu_hz=200.0, cam=cam,
        seed=3, n_lines=12, n_per_line=500, render=True, fov_deg=360.0,
    )
    cfg = small_config()
    cfg.camera = cam_cfg
    cfg.extrin_calib.Rcl = list(synthetic.R_CI_FORWARD.reshape(-1))
    cfg.extrin_calib.Pcl = [0.0, 0.0, 0.0]
    cfg.tpu.vis_point_capacity = 8192
    cfg.tpu.frame_ring = 32
    cfg.vio.patch_pyrimid_level = 3

    ref = LIVOPipeline(cfg, slam_mode="livo")
    traj_ref = ref.process(lseq)

    import copy
    pipe = LIVOPipeline(copy.deepcopy(cfg), slam_mode="livo")
    events = (
        [("scan", s[0] + (s[2][-1] if len(s[2]) else 0), s) for s in lseq.scans]
        + [("img", t, (t, im)) for t, im in lseq.images]
        + [("imu", t, i) for i, t in enumerate(lseq.imu_stamps)]
    )
    events.sort(key=lambda e: e[1])
    n = 0
    for kind, _, payload in events:
        if kind == "scan":
            pipe.push_scan(payload[0], payload[1], payload[2])
        elif kind == "img":
            pipe.push_image(*payload)
        else:
            i = payload
            pipe.push_imu(lseq.imu_stamps[i:i + 1], lseq.imu_gyr[i:i + 1],
                          lseq.imu_acc[i:i + 1])
        n += pipe.poll()
    n += pipe.poll(flush=True)
    pipe._finalize_host_views()

    assert n == len(pipe.trajectory) == len(traj_ref)
    for (t0, R0, p0), (t1, R1, p1) in zip(traj_ref, pipe.trajectory):
        assert t0 == t1
        np.testing.assert_allclose(p0, p1, atol=1e-5)


def test_corrupt_inputs_dropped_and_counted(seq):
    """A2 hardening: NaN sensor rows, IMU loop-backs, and oversized
    scans are rejected at ingestion (counted in dropped_inputs) and the
    pipeline still tracks."""
    pipe = LIVOPipeline(small_config(), slam_mode="only_lio")
    # corrupt scan: NaN rows interleaved + an IMU loop-back + NaN imu row
    for i, (tb, pts, offs) in enumerate(seq.scans):
        if i == 3:
            bad = pts.copy()
            bad[::7] = np.nan
            pipe.push_scan(tb, np.concatenate([bad, pts]),
                           np.concatenate([offs, offs]))
        else:
            pipe.push_scan(tb, pts, offs)
    pipe.push_imu(seq.imu_stamps, seq.imu_gyr, seq.imu_acc)
    pipe.push_imu(seq.imu_stamps[:5], seq.imu_gyr[:5], seq.imu_acc[:5])  # loop-back
    pipe.push_imu(np.array([seq.imu_stamps[-1] + 0.005]),
                  np.full((1, 3), np.nan), np.zeros((1, 3)))  # NaN row
    n = pipe.poll(flush=True)
    pipe._finalize_host_views()
    assert n >= 15
    assert pipe.dropped_inputs["lidar_nan"] > 0
    assert pipe.dropped_inputs["imu"] == 6
    p = np.array([p for _, _, p in pipe.trajectory])
    assert np.isfinite(p).all()
    est = [(t, p) for t, _, p in pipe.trajectory]
    assert synthetic.ate_rmse(est, seq.gt) < 0.06


def test_oversized_scan_truncated():
    pipe = LIVOPipeline(small_config(), slam_mode="only_lio")
    cap = 4 * pipe.cfg.tpu.max_points_per_scan
    big = np.random.default_rng(0).uniform(-5, 5, (cap + 100, 3)).astype(np.float32)
    offs = np.linspace(0, 0.1, cap + 100).astype(np.float32)
    pipe.push_scan(0.0, big, offs)
    assert pipe.dropped_inputs["lidar_oversize"] == 100
    assert len(pipe.pending[0][0]) == cap


def test_midstream_checkpoint_resume_exact(tmp_path, seq):
    """Checkpoint taken mid-stream (undelivered scans + IMU buffer +
    queued events persisted, v2) must resume to the exact trajectory of
    an uninterrupted run."""
    from fast_livo2_tpu.io import checkpoint

    ref = LIVOPipeline(small_config(), slam_mode="only_lio")
    traj_ref = ref.process(seq)

    a = LIVOPipeline(small_config(), slam_mode="only_lio")
    t_cut = 1.3
    for tb, pts, offs in seq.scans:
        a.push_scan(tb, pts, offs)  # all scans pushed; imu only to t_cut
    m = seq.imu_stamps <= t_cut
    a.push_imu(seq.imu_stamps[m], seq.imu_gyr[m], seq.imu_acc[m])
    a.poll()
    n_a = a.frame_id
    assert 0 < n_a < len(traj_ref)
    ck = str(tmp_path / "mid.npz")
    checkpoint.save(ck, a)

    b = LIVOPipeline(small_config(), slam_mode="only_lio")
    checkpoint.load(ck, b)
    b.push_imu(seq.imu_stamps[~m], seq.imu_gyr[~m], seq.imu_acc[~m])
    b.poll(flush=True)
    b._finalize_host_views()
    total = n_a + len(b.trajectory)
    assert total == len(traj_ref)
    # the resumed tail must match the uninterrupted run exactly
    for (t0, R0, p0), (t1, R1, p1) in zip(traj_ref[n_a:], b.trajectory):
        assert t0 == t1
        np.testing.assert_allclose(p0, p1, atol=1e-6)


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


def test_checkpoint_with_prefetch_in_flight(tmp_path, seq):
    """Checkpoint taken while the one-ahead packet prefetch holds the
    next event's already-consumed scan points (r2 advisor, high): the
    prefetch is persisted (checkpoint v3), so resume must reproduce the
    uninterrupted trajectory exactly — previously those points were
    silently dropped and the event ran IMU-only."""
    from fast_livo2_tpu.io import checkpoint

    ref = LIVOPipeline(small_config(), slam_mode="only_lio")
    traj_ref = ref.process(seq)

    a = LIVOPipeline(small_config(), slam_mode="only_lio")
    for tb, pts, offs in seq.scans:
        a.push_scan(tb, pts, offs)
    a.push_imu(seq.imu_stamps, seq.imu_gyr, seq.imu_acc)
    a.poll(max_frames=8)
    assert a._prefetch is not None, "scenario requires an in-flight prefetch"
    n_a = a.frame_id
    ck = str(tmp_path / "pref.npz")
    checkpoint.save(ck, a)

    b = LIVOPipeline(small_config(), slam_mode="only_lio")
    checkpoint.load(ck, b)
    assert b._prefetch is not None
    b.poll(flush=True)
    b._finalize_host_views()
    assert n_a + len(b.trajectory) == len(traj_ref)
    for (t0, R0, p0), (t1, R1, p1) in zip(traj_ref[n_a:], b.trajectory):
        assert t0 == t1
        np.testing.assert_allclose(p0, p1, atol=1e-6)


def test_imu_buffer_trimmed(seq):
    """Consumed IMU samples are dropped as frames run (r2 advisor: the
    buffer grew O(N) for the life of the pipeline with O(N^2) push cost;
    the reference pops its imu deque as packets are consumed)."""
    pipe = LIVOPipeline(small_config(), slam_mode="only_lio")
    pipe.process(seq)
    # 2.5 s at 200 Hz = ~500 pushed; only the post-last-event tail (+2
    # interval-start samples) may remain.
    assert len(pipe._imu_t) < 30
    assert len(pipe._imu_gyr) == len(pipe._imu_t) == len(pipe._imu_acc)


def test_push_image_rejected_in_lidar_only_modes(seq):
    """push_image into 'only_lio'/'only_lo' is dropped and counted — it
    must NOT flip the pipeline to image-driven events (slam_mode
    contract: those modes cut at scan ends)."""
    pipe = LIVOPipeline(small_config(), slam_mode="only_lio")
    img = np.zeros((8, 8), np.uint8)
    pipe.push_image(0.5, img)
    pipe.push_image(0.6, img)
    assert pipe.dropped_inputs["image_mode"] == 2
    assert not pipe._use_images and not pipe._img_queue
    for tb, pts, offs in seq.scans[:5]:
        pipe.push_scan(tb, pts, offs)
    pipe.push_imu(seq.imu_stamps, seq.imu_gyr, seq.imu_acc)
    assert pipe.poll() > 0  # scan-end events still fire


def test_images_queue_host_resident():
    """Queued camera frames stay on the host beyond a bounded device
    window (r2 advisor: shipping every image at push parks the whole
    sequence in HBM)."""
    from fast_livo2_tpu.models import camera as cam_mod
    from fast_livo2_tpu.utils.config import CameraConfig

    cfg = small_config()
    cfg.camera = CameraConfig(cam_model="Pinhole", cam_width=64,
                              cam_height=48, scale=1.0, cam_fx=40.0,
                              cam_fy=40.0, cam_cx=32.0, cam_cy=24.0)
    pipe = LIVOPipeline(cfg, slam_mode="livo")
    img = np.zeros((48, 64), np.uint8)
    for i in range(10):
        pipe.push_image(0.1 * (i + 1), img)
    assert len(pipe._img_queue) == 10
    n_dev = sum(not isinstance(im, np.ndarray)
                for _, im in pipe._img_queue)
    assert 0 < n_dev <= cfg.tpu.img_upload_ahead


def test_checkpoint_preserves_backend_keyframes(tmp_path, seq):
    """Checkpoint v4: the online backend's keyframes + refined poses
    survive a resume, so refinement continues from history instead of
    restarting cold."""
    from fast_livo2_tpu.io import checkpoint

    a = LIVOPipeline(small_config(), slam_mode="only_lio")
    a.enable_online_refine(keyframe_every=2, window=4, stride=2,
                           outer_iters=1, gn_iters=1)
    for tb, pts, offs in seq.scans:
        a.push_scan(tb, pts, offs)
    a.push_imu(seq.imu_stamps, seq.imu_gyr, seq.imu_acc)
    a.poll(max_frames=14)
    a._consume_refine(force=True)
    assert len(a._keyframes) >= 4
    n_kf = len(a._keyframes)
    n_ref = len(a.refined_keyframes)
    assert n_ref >= 4
    ck = str(tmp_path / "kf.npz")
    checkpoint.save(ck, a)

    b = LIVOPipeline(small_config(), slam_mode="only_lio")
    b.enable_online_refine(keyframe_every=2, window=4, stride=2,
                           outer_iters=1, gn_iters=1)
    checkpoint.load(ck, b)
    assert len(b._keyframes) == n_kf
    assert len(b.refined_keyframes) == n_ref
    assert b._last_refine_k == a._last_refine_k
    for kf_a, kf_b in zip(a._keyframes, b._keyframes):
        assert kf_a[0] == kf_b[0]
        np.testing.assert_allclose(np.asarray(kf_a[1]), np.asarray(kf_b[1]))
    # resumed pipeline keeps refining
    b.poll(flush=True)
    b._finalize_host_views()
    assert len(b.refined_keyframes) >= n_ref


def test_late_scan_does_not_corrupt_cursor(seq):
    """r3 review finding: a scan arriving AFTER later scans were already
    processed must not fire a backwards event (the sync cursor is
    monotonic — the reference clears buffers on loop-back). The late
    event is dropped + counted and timestamps stay strictly increasing;
    a late scan that is still AHEAD of the cursor is processed in
    order."""
    pipe = LIVOPipeline(small_config(), slam_mode="only_lio")
    scans = list(seq.scans)
    late = scans[4]
    for i, (tb, pts, offs) in enumerate(scans[:9]):
        if i != 4:
            pipe.push_scan(tb, pts, offs)
    pipe.push_imu(seq.imu_stamps, seq.imu_gyr, seq.imu_acc)
    pipe.poll()
    n_before = pipe.frame_id
    assert n_before >= 4

    pipe.push_scan(*late)  # now behind the cursor
    pipe.poll()
    assert pipe.dropped_inputs.get("stale_event", 0) == 1
    # later scans still process, and timestamps stay monotonic
    for tb, pts, offs in scans[9:12]:
        pipe.push_scan(tb, pts, offs)
    pipe.poll(flush=True)
    pipe._finalize_host_views()
    ts = [t for t, _, _ in pipe.trajectory]
    assert all(t1 > t0 for t0, t1 in zip(ts, ts[1:]))

    # not-yet-stale out-of-order push: events re-order, nothing dropped
    p2 = LIVOPipeline(small_config(), slam_mode="only_lio")
    p2.push_scan(*scans[0])
    p2.push_scan(*scans[2])
    p2.push_scan(*scans[1])  # late but ahead of the (unstarted) cursor
    assert p2._scan_events == sorted(p2._scan_events)
    p2.push_imu(seq.imu_stamps, seq.imu_gyr, seq.imu_acc)
    p2.poll(flush=True)
    p2._finalize_host_views()
    ts2 = [t for t, _, _ in p2.trajectory]
    assert all(t1 > t0 for t0, t1 in zip(ts2, ts2[1:]))
    assert p2.dropped_inputs.get("stale_event", 0) == 0


def test_packet_overflow_decimates_evenly():
    """Overflow regression gate (r3): packet points are time-sorted, so
    head-truncating an oversized packet keeps only the sweep's first
    azimuth wedge (measured 10x worse drift outdoors). The packet
    builder must decimate EVENLY to exactly max_points_per_scan."""
    cfg = small_config()  # max_points_per_scan = 8192
    pipe = LIVOPipeline(cfg, slam_mode="only_lo")
    n = 20000
    offs = np.linspace(0.0, 0.1, n, endpoint=False).astype(np.float32)
    az = offs / 0.1 * 2 * np.pi
    pts = np.stack([5 * np.cos(az), 5 * np.sin(az),
                    np.zeros_like(az)], axis=-1).astype(np.float32)
    pipe.push_scan(0.0, pts, offs)
    pipe.last_update_time = 0.0
    _, pack = pipe._prepare_packet(0.1, pipe._imu_buf())
    pack = np.asarray(pack)
    cap = cfg.tpu.max_points_per_scan
    assert pack[:, 4].sum() == cap  # budget fully used
    t = pack[pack[:, 4] > 0.5, 3]
    assert t.max() > 0.095  # spans the whole sweep, not a head wedge
    hist, _ = np.histogram(t, bins=10, range=(0.0, 0.1))
    assert hist.min() > 0.8 * cap / 10  # even coverage per time decile
