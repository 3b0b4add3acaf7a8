"""Typed configuration tree, YAML-schema-compatible with the reference.

One dataclass per YAML section so the four reference sensor configs
(config/avia.yaml, NTU_VIRAL.yaml, HILTI22.yaml, MARS_LVIG.yaml — schema
read in src/LIVMapper.cpp:50-117 and src/voxel_map.cpp:36-53) load nearly
verbatim. A `tpu:` section (new) holds the fixed-capacity knobs the
array-programming design needs (pad sizes, hash capacities, pool sizes)
that the pointer-based reference never had to name.
"""

from dataclasses import dataclass, field, fields
from typing import List, Optional

import yaml


def _section(cls, data: Optional[dict]):
    """Build dataclass `cls` from a dict, ignoring unknown keys."""
    data = data or {}
    names = {f.name for f in fields(cls)}
    return cls(**{k: v for k, v in data.items() if k in names})


@dataclass
class CommonConfig:
    img_topic: str = "/left_camera/image"
    lid_topic: str = "/livox/lidar"
    imu_topic: str = "/livox/imu"
    img_en: int = 1
    lidar_en: int = 1
    ros_driver_bug_fix: bool = False


@dataclass
class ExtrinsicConfig:
    # LiDAR -> IMU (extrinsic_T/R) and LiDAR -> camera (Rcl/Pcl), row-major.
    extrinsic_T: List[float] = field(default_factory=lambda: [0.0, 0.0, 0.0])
    extrinsic_R: List[float] = field(default_factory=lambda: [1, 0, 0, 0, 1, 0, 0, 0, 1])
    Rcl: List[float] = field(default_factory=lambda: [1, 0, 0, 0, 1, 0, 0, 0, 1])
    Pcl: List[float] = field(default_factory=lambda: [0.0, 0.0, 0.0])


@dataclass
class TimeOffsetConfig:
    imu_time_offset: float = 0.0
    img_time_offset: float = 0.0
    exposure_time_init: float = 0.0
    lidar_time_offset: float = 0.0


@dataclass
class PreprocessConfig:
    point_filter_num: int = 1
    filter_size_surf: float = 0.1
    lidar_type: int = 1  # LID_TYPE enum, common_lib.h:38-47
    scan_line: int = 6
    blind: float = 0.8
    feature_extract_enabled: bool = False  # LOAM surf-feature path
    # (preprocess.cpp:746-1097; LIVMapper.cpp:95) — default off as in
    # every shipped reference config
    hilti_en: bool = False  # 40->10 Hz image decimation (LIVMapper.cpp:841-845)


@dataclass
class VIOParams:
    max_iterations: int = 5
    outlier_threshold: float = 1000.0
    img_point_cov: float = 100.0
    patch_size: int = 8
    patch_pyrimid_level: int = 4  # (sic) reference spelling
    normal_en: bool = True
    ncc_en: bool = False  # NCC gate on warped-vs-current patches in
    ncc_thre: float = 0.0  # retrieval (vio.cpp:753-762, vio.h:101,109)
    raycast_en: bool = False
    inverse_composition_en: bool = False
    exposure_estimate_en: bool = True
    inv_expo_cov: float = 0.1
    grid_size: int = 5
    grid_n_height: int = 17


@dataclass
class IMUParams:
    imu_en: bool = True
    imu_int_frame: int = 30
    acc_cov: float = 0.5
    gyr_cov: float = 0.3
    b_acc_cov: float = 0.0001
    b_gyr_cov: float = 0.0001
    # Estimation toggles (LIVMapper.cpp:85-86 -> ImuProcess::disable_*,
    # IMU_Processing.cpp:56-72): freeze the gravity / accel+gyro-bias
    # blocks of the filter when off.
    gravity_est_en: bool = True
    ba_bg_est_en: bool = True


@dataclass
class LIOParams:
    max_iterations: int = 5
    dept_err: float = 0.02
    beam_err: float = 0.05
    min_eigen_value: float = 0.0025
    sigma_num: float = 3.0
    voxel_size: float = 0.5
    max_layer: int = 2
    max_points_num: int = 50
    layer_init_num: List[int] = field(default_factory=lambda: [5, 5, 5, 5, 5])


@dataclass
class LocalMapParams:
    map_sliding_en: bool = False
    half_map_size: int = 100
    sliding_thresh: float = 8.0


@dataclass
class UAVParams:
    imu_rate_odom: bool = False
    gravity_align_en: bool = False


@dataclass
class PublishParams:
    dense_map_en: bool = True
    pub_effect_point_en: bool = False
    pub_plane_en: bool = False
    pub_scan_num: int = 1
    blind_rgb_points: float = 0.0


@dataclass
class EvoParams:
    seq_name: str = "sequence"
    pose_output_en: bool = False


@dataclass
class PCDSaveParams:
    pcd_save_en: bool = False
    type: int = 0
    colmap_output_en: bool = False
    filter_size_pcd: float = 0.15
    interval: int = -1


@dataclass
class CameraConfig:
    """Camera yaml (reference config/camera_*.yaml, loaded by vikit)."""

    cam_model: str = "Pinhole"
    cam_width: int = 640
    cam_height: int = 512
    scale: float = 1.0
    cam_fx: float = 400.0
    cam_fy: float = 400.0
    cam_cx: float = 320.0
    cam_cy: float = 256.0
    cam_d0: float = 0.0
    cam_d1: float = 0.0
    cam_d2: float = 0.0
    cam_d3: float = 0.0
    # Equidistant (fisheye) coefficients
    k1: float = 0.0
    k2: float = 0.0
    k3: float = 0.0
    k4: float = 0.0


@dataclass
class TPUParams:
    """Fixed-shape capacities for the array-programming design (new)."""

    max_points_per_scan: int = 32768  # pad size for undistorted scans.
    # SIZING RULE (r4): this caps the points per SYNC PACKET, and in
    # LIVO mode a packet spans every scan up to the next image — at
    # image rates below the LiDAR rate that is ceil(lidar_hz/img_hz)
    # scans. Undersizing silently decimates the LiDAR stream (overflow
    # drops 1-in-N evenly) and costs LIO accuracy long before any
    # visual-pool capacity matters: measured 6x ATE degradation at a
    # 5 Hz-image/8192-cap stress point (tests/test_long_run.py).
    max_points_down: int = 8192  # pad size after voxel-grid downsample
    max_imu_per_packet: int = 64  # pad size for the IMU batch per sync packet
    hash_capacity_log2: int = 18  # per-layer voxel hash slots (2^18 = 262144)
    hash_probe_len: int = 4  # linear probes before giving up
    descend_compact: int = 4096  # steady-state map insert: process voxel
    # layers >= 1 only for the points whose layer-0 voxel failed the plane
    # test, compacted to this many lanes (0 = all layers on all points).
    # Overflow lanes skip the fine layers for one frame.
    insert_compact: int = 2048  # steady-state map insert: compact new
    # (unresolved) keys to this many lanes before the claim rounds; 0 off.
    # Lanes count POINTS in not-yet-mapped voxels; overflow drops to the
    # next frame (self-healing), so size for burst frames (new rooms).
    sticky_cut: bool = False  # reference octree topology (r5): a voxel
    # with children that fails the plane test with enough points becomes
    # a permanent internal node (octo_state_=1, voxel_map.cpp:219-268)
    # instead of refitting every frame. Measured 2x WORSE than the
    # per-frame refit on the outdoor 2 m benchmark (see
    # core/voxel_map.VoxelMapConfig.sticky_cut) — A/B knob, default off.
    pre_descend_margin: float = 0.5  # fitted planes with
    # lam0 > margin * min_eigen_value are 'marginal': their children
    # pre-accumulate stats so a later cut has sub-planes ready at once
    # (stands in for cut_octo_tree's point seeding). 1.0 disables;
    # 0.0 descends behind every plane (full multi-resolution).
    match_finest: bool = False  # prefer the deepest gated plane in the
    # chain over the reference's coarse-first semantics. Measured WORSE
    # at the outdoor 2 m point (see
    # core/voxel_map.VoxelMapConfig.match_finest) — A/B knob only; the
    # shipped large-voxel fix is lio_plane_info_cap.
    vis_point_capacity: int = 65536  # visual point pool
    vis_obs_per_point: int = 8  # observation slots per visual point
    frame_ring: int = 64  # reference-frame ring buffer length
    img_upload_ahead: int = 3  # queued camera frames resident on device
    # ahead of their event (bounded-HBM h2d overlap window)
    max_tracked_points: int = 256  # per-frame visual submap pad size
    lio_plane_info_cap: int = 0  # >0: cap the effective point count any
    # single matched plane contributes to one ESIKF update (information
    # equalization across planes — points sharing a plane share its fit
    # error, so their residuals are correlated; see core/lio.py). New
    # capability, no reference counterpart; 0 = off (reference-faithful
    # independent weighting).
    lio_fresh_every_iter: bool = False  # full correspondence re-search
    # on EVERY ESIKF iteration — the reference's exact behavior
    # (BuildResidualListOMP re-runs per iteration, voxel_map.cpp:409).
    # Costs ~one match_planes per extra iteration; measured on the
    # outdoor 2 m transient in r5 (see mars_lvig.yaml tpu section).
    lio_rematch_fresh: bool = True  # True (default): full correspondence
    # re-search on the LIO rematch round, faithful to the reference
    # (BuildResidualListOMP every iteration, voxel_map.cpp:409).
    # False: re-gate the carried matches instead, saving one
    # match_planes search (~5 ms/frame) — measured identical on the
    # planar room but 1.8x WORSE ATE on the hard non-planar benchmark
    # (0.0175 vs 0.0097, tests/test_hard_scene.py), so the shortcut is
    # opt-in for latency-bound planar-world deployments only.
    deferred_map_insert: bool = True  # dispatch the voxel-map insert as
    # a separate device program AFTER the pose-producing programs: the
    # posterior pose no longer waits for the ~16 ms insert (blocked
    # latency win), while queue order still guarantees the NEXT frame's
    # LIO matches against the updated map. Only semantic change: the
    # same frame's VIO normal-refinement/raycast queries see the map as
    # of the previous frame (the reference updates the map before
    # handleVIO, LIVMapper.cpp:430-448) — measured ATE-neutral on the
    # hard benchmark.
    wire_q16: bool = False  # ship the scan packet as int16 xyz (per-
    # packet scale, <=2.5 mm quantization at 80 m range — below sensor
    # noise) + uint16 time offsets + a valid count, dequantized to f32
    # on device: 8 B/point vs 20 B. The remote-TPU link is transfer-
    # bound in pipelined replay, so wire size is throughput. Off by
    # default (bit-exact f32 wire); bench A/Bs it.
    true_pyramid: bool = False  # photometric update samples anti-
    # aliased box-average pyramid levels instead of raw strided level-0
    # taps (the reference's behavior). See ops/image.box_stack and the
    # measured A/B in tests/test_pyramid_ab.py.
    pallas_photo: bool = True  # fuse each photometric ESIKF iteration
    # (strided sample + Jacobian chain + masked 7x7 normal equations)
    # into ONE Pallas kernel (ops/pallas_photo) instead of the ~40-op
    # XLA chain. Pinhole + raw-strided sampling only (fisheye and
    # true_pyramid fall back to the XLA path automatically, as do
    # frames tracking > 448 points — the one-program-per-point grid
    # wins in the launch-bound regime, measured 2.39 -> 1.76 ms at
    # avia's M=396 but 2.04 vs 1.27 at dense's M=512 where XLA's
    # batched gathers amortize). End-to-end trajectory parity is
    # sub-mm (tests/test_pallas_photo.py).
    stage_timing: bool = False  # per-frame per-stage device timing: run
    # the frame as separate blocking stage programs (propagate/undistort/
    # downsample/LIO/map/VIO) and record each stage's ms in FrameLog —
    # the reference's per-frame stage tables (LIVMapper.cpp:465-476,
    # vio.cpp:1851-1868) from the production pipeline. Adds per-stage
    # dispatch+sync overhead, so it is an observability mode, not the
    # deployment fast path.
    fused_frame: bool = False  # one jit per frame (lowest dispatch) vs
    # two (LIO, VIO) — the fused program minimizes per-frame overhead but
    # its first compile is much longer; split is the safe default
    dtype: str = "float32"


@dataclass
class LIVOConfig:
    common: CommonConfig = field(default_factory=CommonConfig)
    extrin_calib: ExtrinsicConfig = field(default_factory=ExtrinsicConfig)
    time_offset: TimeOffsetConfig = field(default_factory=TimeOffsetConfig)
    preprocess: PreprocessConfig = field(default_factory=PreprocessConfig)
    vio: VIOParams = field(default_factory=VIOParams)
    imu: IMUParams = field(default_factory=IMUParams)
    lio: LIOParams = field(default_factory=LIOParams)
    local_map: LocalMapParams = field(default_factory=LocalMapParams)
    uav: UAVParams = field(default_factory=UAVParams)
    publish: PublishParams = field(default_factory=PublishParams)
    evo: EvoParams = field(default_factory=EvoParams)
    pcd_save: PCDSaveParams = field(default_factory=PCDSaveParams)
    camera: CameraConfig = field(default_factory=CameraConfig)
    tpu: TPUParams = field(default_factory=TPUParams)


_SECTIONS = {
    "common": CommonConfig,
    "extrin_calib": ExtrinsicConfig,
    "time_offset": TimeOffsetConfig,
    "preprocess": PreprocessConfig,
    "vio": VIOParams,
    "imu": IMUParams,
    "lio": LIOParams,
    "local_map": LocalMapParams,
    "uav": UAVParams,
    "publish": PublishParams,
    "evo": EvoParams,
    "pcd_save": PCDSaveParams,
    "camera": CameraConfig,
    "tpu": TPUParams,
}


def load_config(sensor_yaml: Optional[str] = None, camera_yaml: Optional[str] = None) -> LIVOConfig:
    """Load a LIVOConfig from reference-schema YAML file(s).

    `sensor_yaml` follows config/avia.yaml et al.; `camera_yaml` follows
    config/camera_pinhole.yaml. Either may be omitted for defaults.
    """
    raw = {}
    if sensor_yaml is not None:
        with open(sensor_yaml) as f:
            raw = yaml.safe_load(f) or {}
    kwargs = {name: _section(cls, raw.get(name)) for name, cls in _SECTIONS.items()}
    if camera_yaml is not None:
        with open(camera_yaml) as f:
            cam_raw = yaml.safe_load(f) or {}
        kwargs["camera"] = _section(CameraConfig, cam_raw)
    return LIVOConfig(**kwargs)
