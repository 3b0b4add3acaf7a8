"""Online exposure estimation + state-trace/COLMAP export surfaces."""

import os

import numpy as np
import jax.numpy as jnp

from fast_livo2_tpu.core.pipeline import LIVOPipeline
from fast_livo2_tpu.io import synthetic
from fast_livo2_tpu.models import camera as cam_mod
from tests.test_pipeline_livo import livo_config, small_cam_cfg


def test_exposure_estimation_tracks_brightness_change():
    """The 7th state column (inverse exposure) must track a synthetic
    exposure ramp: residual r = tau*I_cur - tau_ref*I_ref only vanishes
    when the estimated tau compensates the brightness change
    (vio.cpp:1612-1628)."""
    cam = cam_mod.make_camera(small_cam_cfg())
    # exposure drops 30% over the sequence after the still phase
    expo = lambda t: 1.0 / (1.0 + 0.5 * max(0.0, t - 0.6))
    seq = synthetic.make_sequence(
        duration=3.0, lidar_hz=10.0, img_hz=10.0, imu_hz=200.0, cam=cam,
        seed=5, n_lines=12, n_per_line=500, render=True, fov_deg=360.0,
        exposure_fn=expo,
    )
    pipe = LIVOPipeline(livo_config(), slam_mode="livo")
    traj = pipe.process(seq)
    assert len(traj) >= 20
    # estimated inverse exposure (relative to its initial value) should
    # rise as true exposure falls: tau ~ 1/exposure
    tau = float(np.asarray(pipe.state.inv_expo))
    t_end = traj[-1][0]
    expected_ratio = 1.0 / expo(t_end)  # tau_end / tau_start
    assert tau > 1.0 + 0.4 * (expected_ratio - 1.0), (tau, expected_ratio)
    # and the pose still tracks
    est = [(t, p) for t, R, p in traj]
    rmse = synthetic.ate_rmse(est, seq.gt)
    assert rmse < 0.08, rmse


def test_state_traces_and_colmap_export(tmp_path):
    seq = synthetic.make_sequence(
        duration=1.5, lidar_hz=10.0, imu_hz=200.0, seed=0,
        n_lines=10, n_per_line=400, render=False, fov_deg=360.0,
    )
    cfg = livo_config()
    cfg.evo.pose_output_en = True
    pipe = LIVOPipeline(cfg, slam_mode="only_lio")
    pipe.process(seq)
    pre = str(tmp_path / "mat_pre.txt")
    post = str(tmp_path / "mat_out.txt")
    pipe.save_state_traces(pre, post)
    a = np.loadtxt(pre)
    b = np.loadtxt(post)
    assert a.shape == b.shape and a.shape[1] == 17  # t + 16 state cols
    assert np.isfinite(a).all() and np.isfinite(b).all()

    out = str(tmp_path / "colmap")
    pipe.export_colmap(out)
    assert os.path.exists(os.path.join(out, "sparse", "0", "cameras.txt"))
    imgs = open(os.path.join(out, "sparse", "0", "images.txt")).read()
    assert len(imgs.splitlines()) >= 3 + 2 * len(pipe.trajectory)


def test_pcd_and_mesh_export(tmp_path):
    """pcd_save_en accumulation -> save_pcd (XYZRGB in LIVO mode) and
    save_mesh (TSDF -> colored triangle mesh): the accumulated world
    points must lie on the synthetic room geometry and the chain must
    write loadable artifacts (savePCD + scripts/mesh.py parity)."""
    from fast_livo2_tpu.io.export import read_pcd
    from fast_livo2_tpu.models import camera as cam_mod
    from fast_livo2_tpu.utils.config import CameraConfig

    cam_cfg = CameraConfig(cam_model="Pinhole", cam_width=320,
                           cam_height=256, scale=1.0, cam_fx=200.0,
                           cam_fy=200.0, cam_cx=160.0, cam_cy=128.0)
    cam = cam_mod.make_camera(cam_cfg)
    seq = synthetic.make_sequence(
        duration=1.6, lidar_hz=10.0, img_hz=10.0, imu_hz=200.0, cam=cam,
        seed=0, n_lines=10, n_per_line=400, render=True, fov_deg=360.0,
    )
    cfg = livo_config()
    cfg.camera = cam_cfg
    cfg.extrin_calib.Rcl = list(synthetic.R_CI_FORWARD.reshape(-1))
    cfg.extrin_calib.Pcl = [0.0, 0.0, 0.0]
    cfg.tpu.vis_point_capacity = 8192
    cfg.tpu.frame_ring = 32
    cfg.vio.patch_pyrimid_level = 3
    cfg.pcd_save.pcd_save_en = True
    pipe = LIVOPipeline(cfg, slam_mode="livo")
    pipe.process(seq)

    pcd = str(tmp_path / "map.pcd")
    n = pipe.save_pcd(pcd)
    assert n > 3000
    pts, rgb, _ = read_pcd(pcd)
    assert len(pts) == n and rgb is not None and rgb.max() > 30
    # The cloud lives in the ESTIMATOR's world frame, which differs from
    # the generator's by the unobservable initial transform (2.9 deg
    # initial pitch — see synthetic.ate_rmse docstring). Align with the
    # last est/gt pose pair, then the points must lie on the room
    # surfaces (|x|,|y|=6 or z=-1.5/1.5).
    gt_t = np.array([g[0] for g in seq.gt])
    M = np.mean([seq.gt[np.argmin(np.abs(gt_t - t))][1] @ R.T
                 for t, R, p in pipe.trajectory], axis=0)
    U, _, Vt = np.linalg.svd(M)  # chordal-mean rotation
    R_al = U @ np.diag([1, 1, np.linalg.det(U @ Vt)]) @ Vt
    t_al = np.mean([seq.gt[np.argmin(np.abs(gt_t - t))][2] - R_al @ p
                    for t, R, p in pipe.trajectory], axis=0)
    pts_g = pts @ R_al.T + t_al
    d_wall = np.minimum.reduce([
        np.abs(6.0 - np.abs(pts_g[:, 0])), np.abs(6.0 - np.abs(pts_g[:, 1])),
        np.abs(pts_g[:, 2] + 1.5), np.abs(pts_g[:, 2] - 1.5)])
    assert np.median(d_wall) < 0.05, f"median wall dist {np.median(d_wall):.3f}"
    assert np.quantile(d_wall, 0.9) < 0.15

    mesh = str(tmp_path / "map_mesh.ply")
    nf = pipe.save_mesh(mesh, grid=96)
    assert nf > 500
    head = open(mesh).read().split("end_header")[0]
    assert "element face" in head and "uchar red" in head


def test_png_roundtrip():
    """write_png emits decodable PNGs (gray + RGB) — the image-dump path
    behind pipeline.save_images / plotTrackedPoints overlays."""
    import struct
    import zlib

    import numpy as np

    from fast_livo2_tpu.io.export import write_png

    rng = np.random.default_rng(0)
    for shape, nch in (((40, 60), 1), ((40, 60, 3), 3)):
        img = rng.integers(0, 256, size=shape).astype(np.uint8)
        path = "/tmp/_flv_png_test.png"
        write_png(path, img)
        raw = open(path, "rb").read()
        assert raw[:8] == b"\x89PNG\r\n\x1a\n"
        i, idat = 8, b""
        while i < len(raw):
            ln, tag = struct.unpack(">I4s", raw[i:i + 8])
            if tag == b"IDAT":
                idat += raw[i + 8:i + 8 + ln]
            i += 12 + ln
        d = zlib.decompress(idat)
        h, w = shape[:2]
        out = np.stack([
            np.frombuffer(d[y * (1 + w * nch) + 1:(y + 1) * (1 + w * nch)],
                          np.uint8).reshape(w, nch)
            for y in range(h)
        ])
        np.testing.assert_array_equal(out.squeeze(), img)
