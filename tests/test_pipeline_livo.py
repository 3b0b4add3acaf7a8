"""End-to-end LIVO (LiDAR + camera) regression on a rendered synthetic
sequence, plus camera-model unit tests."""

import numpy as np
import pytest
import jax.numpy as jnp

from fast_livo2_tpu.core.pipeline import LIVOPipeline
from fast_livo2_tpu.io import synthetic
from fast_livo2_tpu.models import camera as cam_mod
from fast_livo2_tpu.utils.config import LIVOConfig, CameraConfig


def small_cam_cfg():
    return CameraConfig(cam_model="Pinhole", cam_width=320, cam_height=256,
                        scale=1.0, cam_fx=200.0, cam_fy=200.0, cam_cx=160.0,
                        cam_cy=128.0)


def test_camera_roundtrip():
    cfg = small_cam_cfg()
    cfg.cam_d0, cfg.cam_d1, cfg.cam_d2, cfg.cam_d3 = -0.1, 0.05, 0.001, -0.002
    cam = cam_mod.make_camera(cfg)
    rng = np.random.default_rng(0)
    # points inside a reasonable frustum — radial distortion polynomials
    # are not invertible arbitrarily far outside the calibrated FOV
    uv = rng.uniform(-0.7, 0.7, size=(200, 2)).astype(np.float32)
    z = rng.uniform(0.5, 10.0, size=(200, 1)).astype(np.float32)
    pts = np.concatenate([uv * z, z], axis=-1)
    px = cam_mod.world2cam(cam, jnp.asarray(pts))
    f = cam_mod.cam2world(cam, px)
    px2 = cam_mod.world2cam(cam, f)
    np.testing.assert_allclose(np.asarray(px), np.asarray(px2), atol=0.05)
    # bearing direction matches the original point
    d = pts / np.linalg.norm(pts, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(f), d, atol=1e-2)


def test_equidistant_roundtrip():
    cfg = small_cam_cfg()
    cfg.cam_model = "equidistant"
    cfg.k1, cfg.k2, cfg.k3, cfg.k4 = -0.04, 0.01, -0.002, 0.0003
    cam = cam_mod.make_camera(cfg)
    rng = np.random.default_rng(1)
    uv = rng.uniform(-0.9, 0.9, size=(200, 2)).astype(np.float32)
    z = rng.uniform(0.5, 10.0, size=(200, 1)).astype(np.float32)
    pts = np.concatenate([uv * z, z], axis=-1)
    px = cam_mod.world2cam(cam, jnp.asarray(pts))
    f = cam_mod.cam2world(cam, px)
    d = pts / np.linalg.norm(pts, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(f), d, atol=1e-3)


@pytest.fixture(scope="module")
def livo_seq():
    cam = cam_mod.make_camera(small_cam_cfg())
    return synthetic.make_sequence(
        duration=3.0, lidar_hz=10.0, img_hz=10.0, imu_hz=200.0, cam=cam,
        seed=0, n_lines=12, n_per_line=500, render=True, fov_deg=360.0,
    )


def livo_config():
    cfg = LIVOConfig()
    cfg.camera = small_cam_cfg()
    cfg.extrin_calib.Rcl = list(synthetic.R_CI_FORWARD.reshape(-1))
    cfg.extrin_calib.Pcl = [0.0, 0.0, 0.0]
    cfg.tpu.max_points_per_scan = 8192
    cfg.tpu.max_points_down = 4096
    cfg.tpu.hash_capacity_log2 = 15
    cfg.tpu.vis_point_capacity = 8192
    cfg.tpu.frame_ring = 32
    cfg.lio.max_layer = 1
    cfg.preprocess.filter_size_surf = 0.15
    cfg.vio.patch_pyrimid_level = 3
    return cfg


def test_livo_tracks_and_uses_vision(livo_seq):
    pipe = LIVOPipeline(livo_config(), slam_mode="livo")
    traj = pipe.process(livo_seq)
    assert len(traj) >= 20
    est = [(t, p) for t, R, p in traj]
    rmse = synthetic.ate_rmse(est, livo_seq.gt)
    assert rmse < 0.06, f"LIVO ATE RMSE {rmse:.3f} m"
    tracked = [r["n_tracked"] for r in pipe.log.rows[3:]]
    assert np.mean(tracked) > 20, f"VIO tracked too few points: {tracked}"


def test_colorize_points():
    import jax.numpy as jnp
    from fast_livo2_tpu.core import vio as vio_mod
    from fast_livo2_tpu.core.state import init_state

    cam = cam_mod.make_camera(small_cam_cfg())
    img = np.zeros((256, 320), np.float32)
    img[:, :] = np.arange(320)[None, :]  # intensity = column index
    state = init_state()
    # camera at origin looking along +z (identity extrinsics)
    pts = jnp.asarray([[0.0, 0.0, 2.0], [0.5, 0.0, 2.0], [0.0, 0.0, -1.0]], jnp.float32)
    colors, vis = vio_mod.colorize_points(
        jnp.asarray(img), pts, jnp.ones(3, bool), state,
        cam, jnp.eye(3), jnp.zeros(3))
    v = np.asarray(vis)
    assert v[0] and v[1] and not v[2]  # behind-camera point invisible
    # center pixel column = cx = 160; offset point projects at 160+50=210
    np.testing.assert_allclose(np.asarray(colors[0, 0]), 160.0, atol=1.0)
    np.testing.assert_allclose(np.asarray(colors[1, 0]), 210.0, atol=1.0)


def test_gravity_alignment():
    from fast_livo2_tpu.core.pipeline import LIVOPipeline
    cfg = livo_config()
    cfg.uav.gravity_align_en = True
    pipe = LIVOPipeline(cfg, slam_mode="only_lio")

    class FakeSeq:
        imu_stamps = np.arange(100) / 200.0
        # tilted gravity: device rolled 10 degrees
        imu_acc = np.tile([0.0, np.sin(0.17) * 9.81, np.cos(0.17) * 9.81], (100, 1))
        imu_gyr = np.zeros((100, 3))

    assert pipe._init_imu(FakeSeq(), 0.6)
    g_world = np.asarray(pipe.state.rot) @ np.array([0, np.sin(0.17), np.cos(0.17)]) * 9.81
    np.testing.assert_allclose(g_world, [0, 0, 9.81], atol=1e-2)
    np.testing.assert_allclose(np.asarray(pipe.state.grav), [0, 0, -9.81], atol=1e-4)


def test_livo_with_raycast_runs():
    """raycast_en path: pipeline must run and recover candidates in
    LiDAR-blind cells (narrow-FOV scan + wide camera)."""
    cam = cam_mod.make_camera(small_cam_cfg())
    seq = synthetic.make_sequence(
        duration=1.6, lidar_hz=10.0, img_hz=10.0, imu_hz=200.0, cam=cam,
        seed=3, n_lines=10, n_per_line=400, render=True, fov_deg=40.0,
    )
    cfg = livo_config()
    cfg.vio.raycast_en = True
    pipe = LIVOPipeline(cfg, slam_mode="livo")
    traj = pipe.process(seq)
    assert len(traj) >= 8
    p = np.array([p for _, _, p in traj])
    assert np.isfinite(p).all() and np.abs(p).max() < 10


def test_livo_fisheye_end_to_end():
    """HILTI-style config path end-to-end: the synthetic room rendered
    through the equidistant fisheye model (render_image traces rays via
    cam2world of the actual model) + raycast on, to a passing ATE gate
    (reference config/camera_fisheye_HILTI22.yaml path)."""
    cfg = livo_config()
    cfg.camera.cam_model = "equidistant"
    cfg.camera.k1, cfg.camera.k2 = -0.04, 0.01
    cfg.camera.k3, cfg.camera.k4 = -0.002, 0.0003
    cfg.vio.raycast_en = True
    cam = cam_mod.make_camera(cfg.camera)
    seq = synthetic.make_sequence(
        duration=2.5, lidar_hz=10.0, img_hz=10.0, imu_hz=200.0, cam=cam,
        seed=9, n_lines=12, n_per_line=500, render=True, fov_deg=360.0,
    )
    pipe = LIVOPipeline(cfg, slam_mode="livo")
    traj = pipe.process(seq)
    assert len(traj) >= 15
    est = [(t, p) for t, R, p in traj]
    rmse = synthetic.ate_rmse(est, seq.gt)
    assert rmse < 0.06, f"fisheye LIVO ATE {rmse:.3f} m"
    tracked = [r.get("n_tracked", 0) for r in pipe.log.rows[3:]]
    assert np.mean(tracked) > 20, f"fisheye tracked {np.mean(tracked):.0f}"


def test_livo_inverse_composition_variant():
    """inverse_composition_en path (updateStateInverse equivalents): the
    6-dof IC update must track the synthetic sequence comparably."""
    cam = cam_mod.make_camera(small_cam_cfg())
    seq = synthetic.make_sequence(
        duration=2.0, lidar_hz=10.0, img_hz=10.0, imu_hz=200.0, cam=cam,
        seed=6, n_lines=12, n_per_line=500, render=True, fov_deg=360.0,
    )
    cfg = livo_config()
    cfg.vio.inverse_composition_en = True
    pipe = LIVOPipeline(cfg, slam_mode="livo")
    traj = pipe.process(seq)
    est = [(t, p) for t, R, p in traj]
    rmse = synthetic.ate_rmse(est, seq.gt)
    assert rmse < 0.08, f"IC ATE {rmse:.3f}"
    tracked = [r.get("n_tracked", 0) for r in pipe.log.rows[3:]]
    assert np.mean(tracked) > 20


def test_deferred_insert_parity(livo_seq):
    """tpu.deferred_map_insert=True (default) queues the voxel-map insert
    AFTER the same frame's VIO dispatch, so VIO normal-refinement reads
    the previous frame's map — a deviation from the reference's
    handleLIO-then-handleVIO order (LIVMapper.cpp:336-482). This pins the
    deviation as trajectory-neutral (VERDICT r3 item 8)."""
    trajs = {}
    for deferred in (True, False):
        cfg = livo_config()
        cfg.tpu.deferred_map_insert = deferred
        pipe = LIVOPipeline(cfg, slam_mode="livo")
        traj = pipe.process(livo_seq, progress=False)
        trajs[deferred] = traj
        rmse = synthetic.ate_rmse([(t, p) for t, _, p in traj], livo_seq.gt)
        assert rmse < 0.06, f"deferred={deferred}: ATE {rmse:.3f} m"
    a, b = trajs[True], trajs[False]
    assert len(a) == len(b)
    # same frames, near-identical poses: the one-frame-stale map read
    # only affects VIO reference-normal refinement, not the LIO matches
    gap = max(np.linalg.norm(pa - pb)
              for (_, _, pa), (_, _, pb) in zip(a, b))
    assert gap < 0.02, f"deferred insert changes trajectory by {gap:.4f} m"
