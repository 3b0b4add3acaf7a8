"""Long-run soak: force every finite-capacity mechanism to cycle.

Runs a long synthetic LIVO sequence with deliberately tight capacities so
that, within one run, the engine must (a) slide the local map several
times (mapSliding semantics, voxel_map.cpp:924-948), (b) wrap the visual
reference-frame ring buffer and evict observations, and (c) churn the
visual point pool — then asserts the estimate stays bounded and finite.
This is the stability property the reference only gets from long rosbag
replays; here it is a scripted, reproducible gate.

Usage:  python scripts/soak.py [--duration 20] [--cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=20.0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--mode", default="livo", choices=["livo", "only_lio"])
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from fast_livo2_tpu.core.pipeline import LIVOPipeline
    from fast_livo2_tpu.io import synthetic
    from fast_livo2_tpu.utils.config import LIVOConfig

    from fast_livo2_tpu.models import camera as cam_mod
    from fast_livo2_tpu.utils.config import CameraConfig

    cfg = LIVOConfig()
    cfg.camera = CameraConfig(cam_model="Pinhole", cam_width=320,
                              cam_height=256, scale=1.0, cam_fx=200.0,
                              cam_fy=200.0, cam_cx=160.0, cam_cy=128.0)
    cfg.extrin_calib.Rcl = list(synthetic.R_CI_FORWARD.reshape(-1))
    cfg.extrin_calib.Pcl = [0.0, 0.0, 0.0]

    t0 = time.time()
    seq = synthetic.make_sequence(
        duration=args.duration, lidar_hz=10.0, imu_hz=200.0, seed=7,
        n_lines=12, n_per_line=500, fov_deg=360.0,
        cam=cam_mod.make_camera(cfg.camera) if args.mode == "livo" else None,
        render=(args.mode == "livo"),
        traj=synthetic.Trajectory(pos_amp=np.array([3.0, 2.2, 0.4])),
        R_ci=synthetic.R_CI_FORWARD,
    )
    print(f"[soak] sequence: {len(seq.scans)} scans in {time.time()-t0:.1f}s")

    # Tight capacities: every pool must cycle within the run.
    cfg.tpu.max_points_per_scan = 8192
    cfg.tpu.max_points_down = 4096
    cfg.tpu.hash_capacity_log2 = 15           # 32k voxel slots/layer
    cfg.tpu.vis_point_capacity = 4096         # visual pool churn
    cfg.tpu.vis_obs_per_point = 4
    cfg.tpu.frame_ring = 8                    # ring wraps every 0.8 s
    cfg.lio.max_layer = 1
    cfg.preprocess.filter_size_surf = 0.15
    cfg.local_map.map_sliding_en = True
    cfg.local_map.sliding_thresh = 1.0        # slide every ~1 m travelled
    cfg.local_map.half_map_size = 30          # in voxels

    pipe = LIVOPipeline(cfg, slam_mode=args.mode)
    t0 = time.time()
    traj = pipe.process(seq)
    wall = time.time() - t0

    est = [(t, p) for t, R, p in traj]
    P = np.array([p for _, p in est])
    assert np.isfinite(P).all(), "non-finite pose in trajectory"
    rmse = synthetic.ate_rmse(est, seq.gt)
    span = np.ptp(P, axis=0)
    n_eff = [r["n_eff"] for r in pipe.log.rows if r["n_eff"] > 0]
    n_trk = [r["n_tracked"] for r in pipe.log.rows]
    print(f"[soak] {len(traj)} frames in {wall:.1f}s "
          f"({wall/max(len(traj),1)*1e3:.0f} ms/frame incl. compile)")
    print(f"[soak] ATE {rmse:.3f} m, span {span.round(2)}, "
          f"mean effective pts {np.mean(n_eff):.0f}, "
          f"mean tracked {np.mean(n_trk):.0f}")
    if args.mode == "livo":
        # the VIO leg must stay alive through ring wraps / pool eviction
        tail_trk = np.mean(n_trk[len(n_trk) // 2:])
        assert tail_trk > 20, f"VIO died mid-run (tail tracked {tail_trk:.0f})"
    # Bounded tracking through slides/evictions/wraps (looser than the
    # steady-capacity gates: sliding throws map away behind the sensor).
    assert rmse < 0.15, f"soak ATE {rmse:.3f} m out of bounds"
    assert span.max() > 2.0, "trajectory did not traverse the room"
    print("[soak] PASS")


if __name__ == "__main__":
    main()
