"""Every shipped config pair must load through the reference YAML schema
and construct a working pipeline (catches schema drift and dead knobs:
each yaml is the reference's sensor setup nearly verbatim)."""

import pytest

from fast_livo2_tpu.core.pipeline import LIVOPipeline
from fast_livo2_tpu.utils.config import load_config

PAIRS = [
    ("configs/avia.yaml", "configs/camera_pinhole.yaml"),
    ("configs/ntu_viral.yaml", "configs/camera_pinhole.yaml"),
    ("configs/hilti22.yaml", "configs/camera_fisheye_hilti22.yaml"),
    ("configs/mars_lvig.yaml", "configs/camera_pinhole.yaml"),
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
        assert cfg.vio.raycast_en and pipe._ray_table is not None
    if "ntu_viral" in sensor:
        assert cfg.time_offset.lidar_time_offset == -0.1
        assert cfg.preprocess.lidar_type == 3
    if "mars" in sensor:
        assert cfg.lio.voxel_size >= 1.0  # aerial big-voxel setup
        assert cfg.local_map.map_sliding_en
