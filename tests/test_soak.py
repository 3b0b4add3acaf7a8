"""Capacity-cycling regression: a short run with deliberately tight
capacities must slide the map, wrap the frame ring, and churn the visual
pool while staying bounded and keeping the VIO leg alive (the scripted
form of the reference's long-rosbag stability expectation; full-length
version in scripts/soak.py)."""

import numpy as np

from fast_livo2_tpu.core.pipeline import LIVOPipeline
from fast_livo2_tpu.io import synthetic
from fast_livo2_tpu.models import camera as cam_mod
from fast_livo2_tpu.utils.config import CameraConfig, LIVOConfig


def _soak_cfg():
    cfg = LIVOConfig()
    cfg.camera = CameraConfig(cam_model="Pinhole", cam_width=320,
                              cam_height=256, scale=1.0, cam_fx=200.0,
                              cam_fy=200.0, cam_cx=160.0, cam_cy=128.0)
    cfg.extrin_calib.Rcl = list(synthetic.R_CI_FORWARD.reshape(-1))
    cfg.extrin_calib.Pcl = [0.0, 0.0, 0.0]
    cfg.tpu.max_points_per_scan = 8192
    cfg.tpu.max_points_down = 4096
    cfg.tpu.hash_capacity_log2 = 15
    cfg.tpu.vis_point_capacity = 2048
    cfg.tpu.vis_obs_per_point = 4
    cfg.tpu.frame_ring = 8          # wraps every 0.8 s
    cfg.lio.max_layer = 1
    cfg.preprocess.filter_size_surf = 0.15
    cfg.local_map.map_sliding_en = True
    cfg.local_map.sliding_thresh = 1.0
    cfg.local_map.half_map_size = 30
    return cfg


def test_tight_capacities_stay_bounded():
    cfg = _soak_cfg()
    seq = synthetic.make_sequence(
        duration=6.0, lidar_hz=10.0, imu_hz=200.0, seed=7, n_lines=12,
        n_per_line=500, fov_deg=360.0, render=True,
        cam=cam_mod.make_camera(cfg.camera),
        traj=synthetic.Trajectory(pos_amp=np.array([3.0, 2.2, 0.4])),
        R_ci=synthetic.R_CI_FORWARD,
    )
    pipe = LIVOPipeline(cfg, slam_mode="livo")
    traj = pipe.process(seq)
    est = [(t, p) for t, R, p in traj]
    P = np.array([p for _, p in est])
    assert np.isfinite(P).all()
    rmse = synthetic.ate_rmse(est, seq.gt)
    assert rmse < 0.15, f"ATE {rmse:.3f} m through slides/evictions"
    # the trajectory crossed the sliding threshold several times
    assert np.ptp(P, axis=0).max() > 2.0
    # VIO alive in the second half (ring has wrapped by then)
    trk = [r["n_tracked"] for r in pipe.log.rows]
    assert np.mean(trk[len(trk) // 2:]) > 20, trk
