"""Every shipped config pair must load through the reference YAML schema
and construct a working pipeline (catches schema drift and dead knobs:
each yaml is the reference's sensor setup verbatim —
tests/test_config_fidelity.py enforces value-level parity)."""

import pytest

from fast_livo2_tpu.core.pipeline import LIVOPipeline
from fast_livo2_tpu.utils.config import load_config

PAIRS = [
    ("configs/avia.yaml", "configs/camera_pinhole.yaml"),
    ("configs/ntu_viral.yaml", "configs/camera_ntu_viral.yaml"),
    ("configs/hilti22.yaml", "configs/camera_fisheye_hilti22.yaml"),
    ("configs/mars_lvig.yaml", "configs/camera_mars_lvig.yaml"),
]


@pytest.mark.parametrize("sensor,camera", PAIRS)
def test_config_pair_builds_pipeline(sensor, camera):
    cfg = load_config(sensor, camera)
    # shrink capacities so construction is cheap on CPU
    cfg.tpu.max_points_per_scan = 1024
    cfg.tpu.max_points_down = 512
    cfg.tpu.hash_capacity_log2 = 10
    cfg.tpu.vis_point_capacity = 512
    cfg.tpu.frame_ring = 4
    pipe = LIVOPipeline(cfg, slam_mode="livo")
    assert pipe.cam.width > 0 and pipe.cam.height > 0
    if "hilti" in sensor:
        assert pipe.cam.model == "equidistant"
        assert cfg.preprocess.hilti_en
        # reference config/HILTI22.yaml:46: raycast off, pyramid 4
        assert not cfg.vio.raycast_en
        assert cfg.vio.patch_pyrimid_level == 4
        assert cfg.lio.voxel_size == 0.4 and cfg.lio.max_points_num == 100
    if "ntu_viral" in sensor:
        assert cfg.time_offset.lidar_time_offset == -0.1
        assert cfg.preprocess.lidar_type == 3
        assert cfg.preprocess.point_filter_num == 3
        assert cfg.camera.cam_width == 752  # the reference's left camera
    if "mars" in sensor:
        assert cfg.lio.voxel_size >= 1.0  # aerial big-voxel setup
        # reference config/MARS_LVIG.yaml: sliding off, layer depth 2,
        # quarter-res camera
        assert not cfg.local_map.map_sliding_en
        assert cfg.lio.max_layer == 2
        assert cfg.camera.scale == 0.25
