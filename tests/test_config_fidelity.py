"""Config fidelity: the shipped configs/*.yaml must match the reference's
config/*.yaml values key-for-key (VERDICT r3 item 2 — round 3 shipped
MARS_LVIG with avia's camera extrinsics and silently re-tuned HILTI22 /
NTU_VIRAL).

Rules:
- Every (section, key) present in a reference YAML must exist in the repo
  YAML with an equal value, except for the whitelisted schema
  adaptations below.
- Additive repo-only content (the `tpu:` section) is allowed.
- Commented-out calibration variants in the reference (MARS AMtown,
  HILTI-2023) are comments, not keys — the active variant must match.

Also runs the reference's `patch_pyrimid_level: 4` end-to-end (three of
four reference configs use 4; round-3 repo configs quietly downgraded
them to 3 and no test exercised level 4).
"""

import math
import os

import numpy as np
import pytest
import yaml

REF = "/root/reference/config"
REPO = os.path.join(os.path.dirname(__file__), "..", "configs")

SENSOR_PAIRS = [
    ("avia.yaml", "avia.yaml"),
    ("NTU_VIRAL.yaml", "ntu_viral.yaml"),
    ("HILTI22.yaml", "hilti22.yaml"),
    ("MARS_LVIG.yaml", "mars_lvig.yaml"),
]
CAMERA_PAIRS = [
    ("camera_pinhole.yaml", "camera_pinhole.yaml"),
    ("camera_fisheye_HILTI22.yaml", "camera_fisheye_hilti22.yaml"),
    ("camera_MARS_LVIG.yaml", "camera_mars_lvig.yaml"),
    ("camera_NTU_VIRAL.yaml", "camera_ntu_viral.yaml"),
]

# (path tuple) -> adapter(ref_value) -> value expected in repo file.
# Every entry is a DELIBERATE schema adaptation, documented here.
WHITELIST = {
    # vikit's loader string "EquidistantCamera" -> our camera factory
    # accepts the model family name (both spellings resolve to the same
    # model in models/camera.make_camera).
    ("cam_model",): lambda v: {"EquidistantCamera": "Equidistant"}.get(v, v),
}


def _values_equal(a, b):
    if isinstance(a, float) or isinstance(b, float):
        return math.isclose(float(a), float(b), rel_tol=0, abs_tol=1e-12)
    if isinstance(a, list):
        return (isinstance(b, list) and len(a) == len(b)
                and all(_values_equal(x, y) for x, y in zip(a, b)))
    return a == b


def _walk(ref_node, repo_node, path, mismatches):
    if isinstance(ref_node, dict):
        for k, v in ref_node.items():
            if not isinstance(repo_node, dict) or k not in repo_node:
                mismatches.append(f"{'.'.join(path + (k,))}: missing in repo")
                continue
            _walk(v, repo_node[k], path + (k,), mismatches)
        return
    adapter = WHITELIST.get(path) or WHITELIST.get(path[-1:])
    expected = adapter(ref_node) if adapter else ref_node
    if not _values_equal(expected, repo_node):
        mismatches.append(
            f"{'.'.join(path)}: reference {ref_node!r} != repo {repo_node!r}")


@pytest.mark.parametrize("ref_name,repo_name", SENSOR_PAIRS + CAMERA_PAIRS)
def test_config_matches_reference(ref_name, repo_name):
    with open(os.path.join(REF, ref_name)) as f:
        ref = yaml.safe_load(f)
    with open(os.path.join(REPO, repo_name)) as f:
        repo = yaml.safe_load(f)
    mismatches = []
    _walk(ref, repo, (), mismatches)
    assert not mismatches, (
        f"{repo_name} drifted from reference {ref_name}:\n  "
        + "\n  ".join(mismatches))


def test_repo_configs_add_only_tpu_section():
    """Repo-only top-level sections are limited to the documented `tpu:`."""
    for ref_name, repo_name in SENSOR_PAIRS:
        with open(os.path.join(REF, ref_name)) as f:
            ref = yaml.safe_load(f)
        with open(os.path.join(REPO, repo_name)) as f:
            repo = yaml.safe_load(f)
        extra = set(repo) - set(ref)
        assert extra <= {"tpu"}, f"{repo_name}: undocumented sections {extra}"


def test_loader_consumes_reference_calibrations():
    """load_config on the regenerated YAMLs reproduces the reference's
    calibration numbers in the typed tree (guards the loader, not just
    the files)."""
    from fast_livo2_tpu.utils.config import load_config

    cfg = load_config(os.path.join(REPO, "mars_lvig.yaml"),
                      os.path.join(REPO, "camera_mars_lvig.yaml"))
    # The exact values from /root/reference/config/MARS_LVIG.yaml:12-15
    # (the r3 file carried avia's numbers here).
    np.testing.assert_allclose(
        cfg.extrin_calib.Rcl[:3], [0.00438814, -0.999807, -0.0191582])
    np.testing.assert_allclose(
        cfg.extrin_calib.Pcl, [0.016069, 0.0871753, -0.0718021])
    assert cfg.camera.scale == 0.25 and cfg.camera.cam_width == 2448
    assert cfg.vio.patch_pyrimid_level == 4
    assert cfg.lio.voxel_size == 2.0 and cfg.lio.max_layer == 2

    hcfg = load_config(os.path.join(REPO, "hilti22.yaml"),
                       os.path.join(REPO, "camera_fisheye_hilti22.yaml"))
    assert hcfg.vio.raycast_en is False
    assert hcfg.vio.patch_pyrimid_level == 4
    assert hcfg.lio.voxel_size == 0.4 and hcfg.lio.max_points_num == 100
    assert hcfg.preprocess.hilti_en is True
    assert hcfg.camera.cam_model == "Equidistant"


def test_pyramid_level_4_end_to_end():
    """The reference's patch_pyrimid_level: 4 (avia/HILTI/MARS) runs the
    full LIVO loop and converges — level 4 was config-reachable but
    never executed by any r3 test."""
    from fast_livo2_tpu.core.pipeline import LIVOPipeline
    from fast_livo2_tpu.io import synthetic
    from fast_livo2_tpu.models import camera as cam_mod
    from fast_livo2_tpu.utils.config import CameraConfig, LIVOConfig

    cam_cfg = CameraConfig(cam_model="Pinhole", cam_width=320,
                           cam_height=256, scale=1.0, cam_fx=200.0,
                           cam_fy=200.0, cam_cx=160.0, cam_cy=128.0)
    cam = cam_mod.make_camera(cam_cfg)
    seq = synthetic.make_sequence(
        duration=2.0, lidar_hz=10.0, img_hz=10.0, imu_hz=200.0, cam=cam,
        seed=3, n_lines=12, n_per_line=500, render=True, fov_deg=360.0)
    cfg = LIVOConfig()
    cfg.camera = cam_cfg
    cfg.extrin_calib.Rcl = list(synthetic.R_CI_FORWARD.reshape(-1))
    cfg.extrin_calib.Pcl = [0.0, 0.0, 0.0]
    cfg.tpu.max_points_per_scan = 8192
    cfg.tpu.max_points_down = 4096
    cfg.tpu.hash_capacity_log2 = 15
    cfg.tpu.vis_point_capacity = 8192
    cfg.tpu.frame_ring = 32
    cfg.lio.max_layer = 1
    cfg.preprocess.filter_size_surf = 0.15
    cfg.vio.patch_pyrimid_level = 4  # the reference's avia value
    pipe = LIVOPipeline(cfg, slam_mode="livo")
    traj = pipe.process(seq, progress=False)
    est = [(t, p) for t, _, p in traj]
    rmse = synthetic.ate_rmse(est, seq.gt)
    assert rmse < 0.05, f"pyramid-4 LIVO diverged: ATE {rmse:.4f} m"
    tracked = [r.get("n_tracked", 0) for r in pipe.log.rows[3:]]
    assert np.mean(tracked) > 20, f"pyramid-4 tracked too few: {tracked}"
