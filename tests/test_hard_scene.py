"""Hard-benchmark accuracy gates (VERDICT round-1 item 1b/4): non-planar
clutter (boxes, cylinders, ramp), occlusions/depth discontinuities,
aggressive motion (~3.5 m/s, ~8 m/s², 7° initial tilt), exposure ramp.
A planar room is the best case for a plane-matching LIO; these gates
hold the engine to <= 0.03 m ATE (evo-convention aligned RMSE) on a
scene built to discriminate.

The gates (<= 0.03 m) are the contract; for current measured values see
the failure messages here and `hard_ate_rmse_m` in the newest
BENCH_r*.json (chip-measured every round) — quoting point measurements
in prose drifted across docs in rounds 1-2, so this header no longer
does. The clutter *helps* a correct implementation (more constraint
directions than 6 axis-aligned walls), so regressions in either
subsystem surface here first."""

import numpy as np
import pytest

from fast_livo2_tpu.core.pipeline import LIVOPipeline
from fast_livo2_tpu.io import synthetic
from fast_livo2_tpu.models import camera as cam_mod
from fast_livo2_tpu.utils.config import CameraConfig, LIVOConfig


def cam_cfg():
    return CameraConfig(cam_model="Pinhole", cam_width=320, cam_height=256,
                        scale=1.0, cam_fx=200.0, cam_fy=200.0, cam_cx=160.0,
                        cam_cy=128.0)


def hard_config(camera=True):
    cfg = LIVOConfig()
    if camera:
        cfg.camera = cam_cfg()
        cfg.extrin_calib.Rcl = list(synthetic.R_CI_FORWARD.reshape(-1))
        cfg.extrin_calib.Pcl = [0.0, 0.0, 0.0]
        cfg.tpu.vis_point_capacity = 8192
        cfg.tpu.frame_ring = 32
        cfg.vio.patch_pyrimid_level = 3
    cfg.tpu.max_points_per_scan = 8192
    cfg.tpu.max_points_down = 4096
    cfg.tpu.hash_capacity_log2 = 15
    cfg.lio.max_layer = 1
    cfg.preprocess.filter_size_surf = 0.15
    return cfg


@pytest.fixture(scope="module")
def hard_seq():
    cam = cam_mod.make_camera(cam_cfg())
    return synthetic.make_sequence(
        duration=3.0, lidar_hz=10.0, img_hz=10.0, imu_hz=200.0, cam=cam,
        seed=7, n_lines=12, n_per_line=500, render=True, fov_deg=360.0,
        planes=synthetic.hard_scene(), traj=synthetic.hard_trajectory(),
        exposure_fn=lambda t: 1.0 + 0.25 * np.sin(0.8 * t),
    )


def _ate(pipe, seq):
    traj = pipe.process(seq)
    assert len(traj) >= 20
    est = [(t, p) for t, R, p in traj]
    return synthetic.ate_rmse(est, seq.gt)


def test_hard_scene_livo_under_3cm(hard_seq):
    rmse = _ate(LIVOPipeline(hard_config(), slam_mode="livo"), hard_seq)
    assert rmse < 0.03, f"hard-scene LIVO ATE {rmse:.4f} m"


def test_hard_scene_lio_only_under_3cm(hard_seq):
    rmse = _ate(LIVOPipeline(hard_config(camera=False), slam_mode="only_lio"),
                hard_seq)
    assert rmse < 0.03, f"hard-scene ONLY_LIO ATE {rmse:.4f} m"


def test_hard_scene_sibling_search_equivalent(hard_seq):
    """Quantify the second documented LIO deviation (VERDICT item 4):
    no sub-voxel sibling search vs the reference's 8-children recursion
    (voxel_map.cpp:713-786). Measured round 2: at the default planner
    threshold the nearest-sibling variant is ATE-identical (0.0097) with
    260 subdivided voxels in play, and marginally worse (0.0174 vs
    0.0166) with subdivision forced at threshold 0.0005 — so the chain-
    only default stands. This test pins the equivalence at defaults."""
    cfg = hard_config(camera=False)
    cfg.lio.max_layer = 2
    pipe_sib = LIVOPipeline(cfg, slam_mode="only_lio")
    pipe_sib.map_cfg = pipe_sib.map_cfg._replace(sibling_search=True)
    rmse_sib = _ate(pipe_sib, hard_seq)
    cfg2 = hard_config(camera=False)
    cfg2.lio.max_layer = 2
    pipe = LIVOPipeline(cfg2, slam_mode="only_lio")
    assert not pipe.map_cfg.sibling_search  # chain-only default
    rmse = _ate(pipe, hard_seq)
    assert rmse < 0.02 and rmse_sib < 0.02
    assert abs(rmse - rmse_sib) < 0.002, f"{rmse:.4f} vs {rmse_sib:.4f}"


def test_hard_scene_rematch_deviation_quantified(hard_seq):
    """Quantify the documented LIO deviation (VERDICT item 4):
    lio_rematch_fresh=False re-gates carried matches on the rematch round
    instead of re-searching (reference re-runs BuildResidualListOMP every
    iteration, voxel_map.cpp:409). Measured here (round 2): fresh 0.0097
    vs carried 0.0175 — an ~80% ATE penalty on non-planar scenes, which
    is why fresh became the DEFAULT. The carried shortcut stays opt-in
    and must at least hold the 3 cm gate."""
    cfg = hard_config(camera=False)
    assert cfg.tpu.lio_rematch_fresh  # reference-faithful default
    rmse_fresh = _ate(LIVOPipeline(cfg, slam_mode="only_lio"), hard_seq)
    cfg2 = hard_config(camera=False)
    cfg2.tpu.lio_rematch_fresh = False
    rmse_carried = _ate(LIVOPipeline(cfg2, slam_mode="only_lio"), hard_seq)
    assert rmse_fresh < 0.02, f"fresh rematch ATE {rmse_fresh:.4f}"
    assert rmse_carried < 0.03, f"carried rematch ATE {rmse_carried:.4f}"
    assert rmse_fresh < rmse_carried + 0.003, (
        f"fresh {rmse_fresh:.4f} should not trail carried {rmse_carried:.4f}")
