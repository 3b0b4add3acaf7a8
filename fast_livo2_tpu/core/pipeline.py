"""The LIVO pipeline: measurement sync + jitted per-frame LIO/VIO steps.

TPU-native equivalent of LIVMapper (reference src/LIVMapper.cpp): the
host owns only the timestamp-driven sync state machine
(sync_packages, LIVMapper.cpp:884-1119) and ragged->fixed batching; every
per-frame computation — IMU propagation, undistortion, downsample, the
two iterated filters, and both map updates — runs as jitted device
programs over donated state so a steady-state frame is a handful of
dispatches with no host round-trips of map-sized data.

Scheduling semantics reproduced from the reference (LIVO mode,
:940-1085): every camera frame at time T triggers
  1. an LIO update over the LiDAR points with absolute time <= T,
     propagated+undistorted with the IMU in (last_update, T], then
  2. a VIO update at exactly T (no further propagation),
and leftover scan points roll into the next packet. ONLY_LIO cuts at
scan-end times instead.
"""

import os
import time
from functools import partial
from typing import List, Optional, Tuple

# Perf-bisection flags (dev only): skip pipeline stages to localize
# in-situ device time. FLV_SKIP=map,lio,vio,und,down
_SKIP = set(os.environ.get("FLV_SKIP", "").split(","))
_NO_DONATE = os.environ.get("FLV_NO_DONATE", "0") == "1"
_BLOCK = os.environ.get("FLV_BLOCK", "0") == "1"

import jax
import jax.numpy as jnp
import numpy as np

# Precision policy: the TPU MXU's default bf16-input matmul precision
# diverges the ESIKF (observed: meter-scale drift within seconds). True
# float32 accumulation is applied *surgically* — inside the SO(3) ops,
# IMU propagation/undistortion, and the two filter updates (see
# jax.default_matmul_precision scopes in ops/so3.py, core/imu.py,
# core/lio.py, core/vio.py) — rather than globally: a global "highest"
# tripled the voxel-map eigh pipeline's compile time for no accuracy
# benefit (plane gates tolerate 1e-3 relative error).

from ..models import camera as cam_mod
from ..models import lidar as lidar_mod
from ..ops import eig3, so3
from ..utils.config import LIVOConfig
from . import imu as imu_mod
from . import lio as lio_mod
from . import vio as vio_mod
from . import voxel_map as vmap_mod
from .state import NavState, init_cov, init_state, pack_state, unpack_state


def _plane_cond(match, valid):
    """Plane-direction conditioning of one LIO update: the smallest
    eigenvalue of the matched-normal second moment sum n n^T, normalized
    by the match count — in [0, 1/3]. Near 1/3 = isotropic constraint
    directions; near 0 = translation unobservable along some axis
    (corridor / single dominant plane). Drives the degeneracy-gated
    backend engagement (VERDICT r4 weak #5)."""
    use = match.valid & valid
    n = jnp.where(use[:, None], match.normal, 0.0)
    nn = n.T @ n
    cnt = jnp.maximum(jnp.sum(use.astype(jnp.float32)), 1.0)
    evals, _ = eig3.eigh3((nn / cnt)[None])
    return evals[0, 0]


def _pad_points(pts: np.ndarray, offs: np.ndarray, n: int):
    k = min(len(pts), n)
    p = np.zeros((n, 3), np.float32)
    o = np.zeros((n,), np.float32)
    v = np.zeros((n,), bool)
    p[:k] = pts[:k]
    o[:k] = offs[:k]
    v[:k] = True
    return jnp.asarray(p), jnp.asarray(o), jnp.asarray(v)


class FrameLog:
    """Per-frame diagnostics (the reference's per-stage ANSI time tables,
    LIVMapper.cpp:465-476 / vio.cpp:1851-1868, as data)."""

    def __init__(self):
        self.rows: List[dict] = []

    def add(self, **kw):
        self.rows.append(kw)

    def summary(self):
        if not self.rows:
            return {}
        keys = [k for k, v in self.rows[0].items() if isinstance(v, (int, float))]
        return {k: float(np.mean([r[k] for r in self.rows if k in r])) for k in keys}


class LIVOPipeline:
    # Mirrors the reference's slam_mode_ enum (LIVMapper.cpp:162:
    # LIVO | ONLY_LIO | ONLY_LO). "only_lio" = LiDAR+IMU, no camera;
    # "only_lo" = LiDAR only, constant-velocity propagation (IMU-less
    # fallback, IMU_Processing.cpp:151-234).
    SLAM_MODES = ("livo", "only_lio", "only_lo")

    def __init__(self, cfg: LIVOConfig, slam_mode: str = "livo",
                 device=None):
        """`device`: optional jax.Device to pin this pipeline's state to
        (the fleet axis — parallel/batch.MultiStreamReplay places B
        independent streams on B devices; computations follow their
        committed state arrays, so each stream's frame programs run on
        its own device)."""
        if slam_mode not in self.SLAM_MODES:
            raise ValueError(
                f"slam_mode {slam_mode!r} not in {self.SLAM_MODES} "
                "('only_lio' = no camera; 'only_lo' = no camera, no IMU)")
        self.cfg = cfg
        self.slam_mode = slam_mode
        self.device = device
        t = cfg.tpu
        self.map_cfg = vmap_mod.VoxelMapConfig(
            voxel_size=cfg.lio.voxel_size,
            n_layers=cfg.lio.max_layer + 1,
            capacity_log2=t.hash_capacity_log2,
            probes=t.hash_probe_len,
            planner_threshold=cfg.lio.min_eigen_value,
            sigma_num=cfg.lio.sigma_num,
            layer_init_num=tuple(cfg.lio.layer_init_num),
            max_points_num=cfg.lio.max_points_num,
            insert_compact=t.insert_compact,
            descend_compact=t.descend_compact,
            sticky_cut=t.sticky_cut,
            pre_descend_margin=t.pre_descend_margin,
            match_finest=t.match_finest,
        )
        self.cam = cam_mod.make_camera(cfg.camera)
        gs, gnw, gnh = vio_mod.derive_grid(self.cam, cfg.vio.grid_size, cfg.vio.grid_n_height)
        self.vio_cfg = vio_mod.VIOConfig(
            grid_size=gs, grid_n_width=gnw, grid_n_height=gnh,
            patch_size=cfg.vio.patch_size,
            pyramid_levels=cfg.vio.patch_pyrimid_level,
            max_obs=t.vis_obs_per_point,
            pool_capacity=t.vis_point_capacity,
            frame_ring=t.frame_ring,
            max_iterations=cfg.vio.max_iterations,
            img_point_cov=cfg.vio.img_point_cov,
            outlier_threshold=cfg.vio.outlier_threshold,
            exposure_estimate_en=cfg.vio.exposure_estimate_en,
            normal_en=cfg.vio.normal_en,
            ncc_en=cfg.vio.ncc_en,
            ncc_thre=cfg.vio.ncc_thre,
            raycast_en=cfg.vio.raycast_en,
            inverse_composition_en=cfg.vio.inverse_composition_en,
            true_pyramid=t.true_pyramid,
            pallas_photo=t.pallas_photo,
        )
        ext = cfg.extrin_calib
        self.ext_R = jnp.asarray(np.array(ext.extrinsic_R, np.float32).reshape(3, 3))
        self.ext_T = jnp.asarray(np.array(ext.extrinsic_T, np.float32))
        Rcl = np.array(ext.Rcl, np.float32).reshape(3, 3)
        Pcl = np.array(ext.Pcl, np.float32)
        # camera-from-IMU = camera-from-lidar ∘ lidar-from-IMU
        # (VIOManager::initializeVIO, vio.cpp:57-58 with Rli = extR^T)
        ext_R_np = np.asarray(self.ext_R)
        ext_T_np = np.asarray(self.ext_T)
        Rli = ext_R_np.T
        Pli = -ext_R_np.T @ ext_T_np
        self.Rci = jnp.asarray(Rcl @ Rli)
        self.Pci = jnp.asarray(Rcl @ Pli + Pcl)

        self._ray_table = (
            vio_mod.make_ray_table(self.cam, self.vio_cfg)
            if cfg.vio.raycast_en else None
        )
        # device state: state+cov live packed in one vector between frames
        self.packed = pack_state(init_state(), init_cov())
        self.vmap_state = vmap_mod.make_map(self.map_cfg)
        self.pool = vio_mod.make_pool(self.vio_cfg)
        self.ring = vio_mod.make_ring(self.vio_cfg, self.cam)
        if device is not None:
            # Commit every persistent array to the stream's device; the
            # per-frame programs then run there (uncommitted packet/image
            # uploads follow the committed state).
            (self.packed, self.vmap_state, self.pool, self.ring,
             self.ext_R, self.ext_T, self.Rci, self.Pci,
             self._ray_table) = jax.tree.map(
                lambda x: jax.device_put(x, device),
                (self.packed, self.vmap_state, self.pool, self.ring,
                 self.ext_R, self.ext_T, self.Rci, self.Pci,
                 self._ray_table))

        self.noise: Optional[imu_mod.ImuNoise] = None
        self.imu_inited = False
        self.map_inited = False
        self.last_update_time: Optional[float] = None
        self.frame_id = 0
        self.pending: List[Tuple[np.ndarray, np.ndarray]] = []  # (pts, t_abs)
        # Streaming ingestion state (the push/poll equivalent of the
        # reference's sensor callbacks + sync_packages state machine,
        # LIVMapper.cpp:703-860, :884-1119). process() is a thin
        # push-everything + drain wrapper over this.
        self._imu_t = np.zeros((0,), np.float64)
        self._imu_gyr = np.zeros((0, 3), np.float64)
        self._imu_acc = np.zeros((0, 3), np.float64)
        self._img_queue: List[Tuple[float, np.ndarray]] = []
        self._scan_events: List[float] = []  # scan-end event times
        self._scan_horizon = -np.inf  # latest pushed point timestamp
        self._use_images = self.slam_mode == "livo"
        # Rejected-input accounting (corrupt/NaN/loop-back/oversized
        # packets; the reference warns and clears buffers in-band,
        # LIVMapper.cpp:710-795 — offline we drop and count).
        self.dropped_inputs = {"imu": 0, "lidar_nan": 0,
                               "lidar_oversize": 0, "image_mode": 0}
        self._prefetch = None  # (t_ev, (imu_pack, pts_pack)) one ahead
        self._packet_t0: Optional[float] = None  # packet-prep cursor
        # (runs ahead of last_update_time by at most one event)
        # IMU-rate odometry output (uav/imu_rate_odom: the 250 Hz
        # imu_prop_callback, LIVMapper.cpp:576-635), filled per frame
        # when enabled.
        self.imu_rate_trajectory: List[Tuple[float, np.ndarray, np.ndarray]] = []
        self.trajectory: List[Tuple[float, np.ndarray, np.ndarray]] = []
        self.log = FrameLog()
        # Pre/post-update state traces (the reference's Log/mat_pre.txt /
        # mat_out.txt rows, LIVMapper.cpp:284-286, 479-481): device
        # snapshots, converted lazily by save_state_traces.
        self.trace_pre: List = []
        self.trace_post: List = []
        self.state_trace_en = cfg.evo.pose_output_en

        # ONE fused jit call per frame over packed few-leaf interfaces:
        # chained-call dispatch cost on remote TPU links scales with pytree
        # leaf count (~1 ms/leaf), so the whole frame (propagate →
        # undistort → downsample → LIO ESIKF → map update → VIO) runs as a
        # single call of ~15 fat arrays. Map/pool/ring are donated.
        don = () if _NO_DONATE else (1, 2, 3)
        donv = () if _NO_DONATE else (1, 2)
        self._frame_jit = jax.jit(
            self._frame_step,
            static_argnames=("first", "use_vio", "emit_pg", "do_map"),
            donate_argnums=don,
        )
        self._vio_half_jit = jax.jit(self._vio_half, donate_argnums=donv)
        # Deferred map insert (tpu.deferred_map_insert): the voxel-map
        # insert as its own tail program over the pg_pack interface.
        self._map_jit = jax.jit(
            lambda m, pg: vmap_mod.update_map(
                m, pg[:, 0:3], pg[:, 6:12], pg[:, 12] > 0.5,
                self.map_cfg, compact=True),
            donate_argnums=() if _NO_DONATE else (0,),
        )
        self._colorize_jit = jax.jit(
            lambda img, pts, valid, state: vio_mod.colorize_points(
                img.astype(jnp.float32), pts, valid, state, self.cam,
                self.Rci, self.Pci,
                blind=self.cfg.publish.blind_rgb_points,
            )
        )
        # Colored world-map accumulation (pcd_save, LIVMapper.cpp:484-532)
        self.pcd_accumulate = cfg.pcd_save.pcd_save_en
        self._cloud_chunks: List = []
        # Effective (plane-matched) points per frame
        # (publish/pub_effect_point_en -> publish_effect_world,
        # LIVMapper.cpp:446); device-resident until effect_points().
        self._effect_chunks: List = []
        # Keyframe collection for the sliding-window refinement backend
        # (parallel/ba.py): per keyframe the UNDISTORTED posterior body
        # scan (re-derived on device from the frame's posterior world
        # points — not the raw distorted packet) + the posterior pose.
        self.keyframe_every = 0  # frames between keyframes; 0 = off
        self._keyframes: List = []
        self.kf_points = 4096  # body-scan rows retained per keyframe
        self.kf_use_raw = False  # True: retain the RAW (distorted) packet
        # instead — only for the distortion-sensitivity comparison
        # (tests/test_ba.py); measured worse at aggressive motion.
        # Online refinement (VERDICT r2 item 3): refine window k behind
        # the filter while it runs window k+1's frames, feed the newest
        # keyframe's pose delta back. Enable via enable_online_refine().
        self.online_refine = False
        self.refine_window_size = 16
        self.refine_stride = 8
        self.refine_feedback = True
        self._refiner = None
        self._last_refine_k = 0
        self.refine_gate = 0.0  # see enable_online_refine(gate=)
        self._kf_conds: List = []  # per-keyframe plane_cond samples
        self.refine_submits = 0  # windows actually dispatched
        self.refine_gate_skips = 0  # windows skipped as healthy
        self.refined_keyframes = {}  # t -> (R, p), newest refinement wins
        self._imu_hist: List = []  # (stamps, gyr, acc) for link preint
        self.refine_imu_links = True  # preintegrated IMU link factors
        self.refine_photo = False  # capture per-keyframe photometric
        # factors (vio.capture_photo_factors -> ba.PhotoFactors) and add
        # the exposure-normalized photometric residual to refine_window
        # (VERDICT r4 item 4). LIVO mode only (needs images).
        self._kf_photo_jit = None
        self._refine_deltas: List = []  # (t_applied, R_d, p_d) feedback log

        def _kf_scan(packed_sc, pg_pack):
            state, _ = unpack_state(packed_sc)
            N = pg_pack.shape[0]
            k = min(self.kf_points, N)
            idx = jnp.arange(k) * max(1, N // k)  # strided: spatially fair
            pw = pg_pack[idx, 0:3]
            val = pg_pack[idx, 12] > 0.5
            body = (pw - state.pos) @ state.rot  # R^T (p_w - p)
            return jnp.concatenate([body, val[:, None].astype(jnp.float32)],
                                   axis=-1)

        def _kf_scan_raw(pts_pack):
            pts, _, valid = self._unpack_pts(pts_pack)
            N = pts.shape[0]
            k = min(self.kf_points, N)
            idx = jnp.arange(k) * max(1, N // k)
            return jnp.concatenate(
                [pts[idx], valid[idx, None].astype(jnp.float32)], axis=-1)

        def _apply_delta(packed_sc, R_d, p_d):
            # Left (world-frame) SE(3) correction from the backend:
            # T <- D T for pose, v <- R_d v; biases/gravity/cov untouched
            # (deltas are gated small, see _consume_refine).
            state, cov = unpack_state(packed_sc)
            return pack_state(
                state._replace(rot=so3.normalize_rotation(R_d @ state.rot),
                               pos=R_d @ state.pos + p_d,
                               vel=R_d @ state.vel),
                cov)

        self._kf_scan_jit = jax.jit(_kf_scan)
        self._kf_scan_raw_jit = jax.jit(_kf_scan_raw)
        self._apply_delta_jit = jax.jit(_apply_delta)
        # Local-map sliding (mapSliding, voxel_map.cpp:924-948)
        self._slide_jit = jax.jit(
            lambda m, c: vmap_mod.slide_map(
                m, c, cfg.local_map.half_map_size, self.map_cfg
            ),
            donate_argnums=(0,),
        )
        self._last_slide_pos = np.zeros(3)
        self._pos_snapshot = None  # async d2h pose copy for the next check
        self._stage_jits = None  # built lazily when tpu.stage_timing
        self._empty_img = None  # cached no-image placeholder

    def _put(self, x):
        """Upload a host array to this pipeline's device (the fleet
        axis pins state per stream; uncommitted jnp.asarray would land
        on the default device and hop device-to-device every frame)."""
        return (jax.device_put(x, self.device) if self.device is not None
                else jnp.asarray(x))

    @property
    def state(self) -> NavState:
        return unpack_state(self.packed)[0]

    @property
    def cov(self):
        return unpack_state(self.packed)[1]

    # ---------- jitted step bodies ----------

    def _frame_step(self, packed_sc, vmap_state, pool, ring, imu_pack,
                    pts_pack, img, frame_id, first: bool, use_vio: bool,
                    emit_pg: bool = False, do_map: bool = True):
        """The frame as one device program. imu_pack: (K, 9) packed IMU
        intervals (or scalar dt in only_lo mode); pts_pack: (N, 5) packed
        [xyz | t_offs | valid]. Returns (packed_sc, map, pool, ring,
        diag (6,)[, pg_pack (N, 13)]) — pg_pack (world points + matched
        normals + sym6 covariances + valid) feeds the split-mode VIO
        half."""
        cfg = self.cfg
        # Images ship as uint8 (the reference's cv::Mat gray is u8 too) and
        # convert on device: the remote-TPU h2d path is sharply nonlinear in
        # transfer size (1.3 MB f32 image = 51 ms, 0.33 MB u8 = 6 ms), so
        # the u8 wire format removes the pipeline's binding constraint.
        img = img.astype(jnp.float32)
        state, cov = unpack_state(packed_sc)
        pts, t_offs, valid = self._unpack_pts(pts_pack)

        if self.slam_mode == "only_lo":
            dt = imu_pack  # scalar packet duration in this mode
            state_prop, cov_prop = imu_mod.propagate_without_imu(
                state, cov, dt, self.noise
            )
            und = imu_mod.undistort_without_imu(pts, t_offs, dt, state_prop)
        else:
            batch = imu_mod.ImuBatch(
                gyr=imu_pack[:, 0:3], acc=imu_pack[:, 3:6], dt=imu_pack[:, 6],
                offs_end=imu_pack[:, 7], valid=imu_pack[:, 8],
            )
            state_prop, cov_prop, poses = imu_mod.propagate(
                state, cov, batch, self.noise
            )
            und = imu_mod.undistort(pts, t_offs, poses, state_prop,
                                    self.ext_R, self.ext_T)
        if "und" in _SKIP:  # perf bisection: scan-end frame, no motion comp
            und = pts
        if "down" in _SKIP:  # perf bisection: head-truncate instead of voxel grid
            down = und[: cfg.tpu.max_points_down]
            down_valid = valid[: cfg.tpu.max_points_down]
        else:
            down, down_valid = lio_mod.voxel_downsample(
                und, valid, cfg.preprocess.filter_size_surf,
                cfg.tpu.max_points_down,
            )
        if first:
            # BuildVoxelMap with the prior state (LIVMapper.cpp:362-366).
            body_cov = lio_mod.calc_body_cov(down, cfg.lio.dept_err, cfg.lio.beam_err)
            pts_imu = down @ self.ext_R.T + self.ext_T
            pts_w = pts_imu @ state_prop.rot.T + state_prop.pos
            crossmat = so3.skew(pts_imu)
            R_ext = state_prop.rot @ self.ext_R
            var_w = (
                jnp.einsum("ij,njk,lk->nil", R_ext, body_cov, R_ext)
                + crossmat @ cov_prop[0:3, 0:3] @ jnp.swapaxes(crossmat, -1, -2)
                + cov_prop[3:6, 3:6]
            )
            vmap_state = vmap_mod.update_map(vmap_state, pts_w, var_w,
                                             down_valid, self.map_cfg)
            diag = jnp.zeros((6,), jnp.float32)
            out = (pack_state(state_prop, cov_prop), vmap_state, pool, ring,
                   diag)
            if emit_pg:
                out = out + (jnp.zeros((pts_w.shape[0], 13), jnp.float32),)
            return out

        res = lio_mod.lio_update(
            state_prop, cov_prop, vmap_state, down, down_valid,
            self.ext_R, self.ext_T, self.map_cfg,
            dept_err=cfg.lio.dept_err, beam_err=cfg.lio.beam_err,
            max_iterations=cfg.lio.max_iterations if "lio" not in _SKIP else 1,
            rematch_fresh=cfg.tpu.lio_rematch_fresh,
            fresh_every_iter=cfg.tpu.lio_fresh_every_iter,
            plane_info_cap=cfg.tpu.lio_plane_info_cap,
        )
        if do_map and "map" not in _SKIP:
            vmap_state = vmap_mod.update_map(
                vmap_state, res.pts_w, res.var_w, down_valid, self.map_cfg,
                compact=True,
            )
        state, cov = res.state, res.cov
        n_tracked = jnp.asarray(0, jnp.int32)
        n_added = jnp.asarray(0, jnp.int32)
        verr = jnp.asarray(0.0)
        if use_vio:
            normal = jnp.where(res.match.valid[:, None], res.match.normal, 0.0)
            vres = vio_mod.vio_step(
                state, cov, pool, ring, vmap_state, img, res.pts_w, normal,
                res.var_w, down_valid, frame_id, self.cam, self.Rci, self.Pci,
                self.vio_cfg, self.map_cfg, ray_table=self._ray_table,
            )
            state, cov = vres.state, vres.cov
            pool, ring = vres.pool, vres.ring
            n_tracked, n_added, verr = vres.n_tracked, vres.n_added, vres.mean_error
        diag = jnp.stack([
            res.n_effective.astype(jnp.float32), res.mean_residual,
            n_tracked.astype(jnp.float32), n_added.astype(jnp.float32),
            verr, _plane_cond(res.match, down_valid),
        ])
        out = (pack_state(state, cov), vmap_state, pool, ring, diag)
        if emit_pg:
            normal = jnp.where(res.match.valid[:, None], res.match.normal, 0.0)
            pg_pack = jnp.concatenate(
                [res.pts_w, normal, vmap_mod.sym6(res.var_w),
                 down_valid[:, None].astype(jnp.float32)], axis=-1,
            )
            out = out + (pg_pack,)
        return out

    def _vio_half(self, packed_sc, pool, ring, vmap_state, img, pg_pack,
                  frame_id):
        """Split-mode VIO half over packed interfaces."""
        img = img.astype(jnp.float32)  # u8 wire format (see _frame_step)
        state, cov = unpack_state(packed_sc)
        vres = vio_mod.vio_step(
            state, cov, pool, ring, vmap_state, img,
            pg_pack[:, 0:3], pg_pack[:, 3:6], pg_pack[:, 6:12],
            pg_pack[:, 12] > 0.5, frame_id, self.cam, self.Rci, self.Pci,
            self.vio_cfg, self.map_cfg, ray_table=self._ray_table,
        )
        diag = jnp.stack([
            vres.n_tracked.astype(jnp.float32),
            vres.n_added.astype(jnp.float32), vres.mean_error,
        ])
        return pack_state(vres.state, vres.cov), vres.pool, vres.ring, diag

    def _unpack_pts(self, pts_pack):
        """(pts (N, 3), t_offs (N,), valid (N,)) from either wire format
        (tpu.wire_q16: int16 xyz at per-packet scale + uint16 offsets +
        a valid count — 8 B/point on the transfer-bound remote link)."""
        if self.cfg.tpu.wire_q16:
            q = pts_pack[:-2]
            meta = jax.lax.bitcast_convert_type(
                pts_pack[-2:].reshape(4, 2), jnp.float32)
            pts = q[:, 0:3].astype(jnp.float32) * meta[0]
            offs_u = q[:, 3].astype(jnp.int32) & 0xFFFF  # uint16 bitcast
            t_offs = offs_u.astype(jnp.float32) * (meta[1] / 65535.0)
            valid = jnp.arange(q.shape[0]) < meta[2].astype(jnp.int32)
            return pts, t_offs, valid
        return pts_pack[:, 0:3], pts_pack[:, 3], pts_pack[:, 4] > 0.5

    # ---------- per-stage timing mode (tpu.stage_timing) ----------

    def _build_stage_jits(self):
        """The frame's stages as separate jitted programs, built from the
        same module functions _frame_step composes — the per-frame stage
        table of the reference (DownSample/ICP/updateVoxelMap,
        LIVMapper.cpp:465-476; VIO rows vio.cpp:1851-1868) measured on
        the production pipeline itself."""
        cfg = self.cfg

        def prop(packed_sc, imu_pack):
            state, cov = unpack_state(packed_sc)
            batch = imu_mod.ImuBatch(
                gyr=imu_pack[:, 0:3], acc=imu_pack[:, 3:6], dt=imu_pack[:, 6],
                offs_end=imu_pack[:, 7], valid=imu_pack[:, 8])
            state_prop, cov_prop, poses = imu_mod.propagate(
                state, cov, batch, self.noise)
            K = imu_pack.shape[0]
            pose_tab = jnp.concatenate([
                poses.offs_start[:, None], poses.offs_end[:, None],
                poses.rot.reshape(K, 9), poses.pos, poses.vel, poses.acc_w,
                poses.gyr_unbiased, poses.valid[:, None]], axis=-1)
            return pack_state(state_prop, cov_prop), pose_tab

        def und(packed_prop, pose_tab, pts_pack):
            state_prop, _ = unpack_state(packed_prop)
            K = pose_tab.shape[0]
            poses = imu_mod.ImuPoses(
                offs_start=pose_tab[:, 0], offs_end=pose_tab[:, 1],
                rot=pose_tab[:, 2:11].reshape(K, 3, 3),
                pos=pose_tab[:, 11:14], vel=pose_tab[:, 14:17],
                acc_w=pose_tab[:, 17:20], gyr_unbiased=pose_tab[:, 20:23],
                valid=pose_tab[:, 23])
            pts, t_offs, _ = self._unpack_pts(pts_pack)
            return imu_mod.undistort(pts, t_offs, poses, state_prop,
                                     self.ext_R, self.ext_T)

        def down(und_pts, pts_pack):
            _, _, valid = self._unpack_pts(pts_pack)
            return lio_mod.voxel_downsample(
                und_pts, valid,
                cfg.preprocess.filter_size_surf, cfg.tpu.max_points_down)

        def lio(packed_prop, vmap_state, down_pts, down_valid):
            state_prop, cov_prop = unpack_state(packed_prop)
            res = lio_mod.lio_update(
                state_prop, cov_prop, vmap_state, down_pts, down_valid,
                self.ext_R, self.ext_T, self.map_cfg,
                dept_err=cfg.lio.dept_err, beam_err=cfg.lio.beam_err,
                max_iterations=cfg.lio.max_iterations,
                rematch_fresh=cfg.tpu.lio_rematch_fresh,
                fresh_every_iter=cfg.tpu.lio_fresh_every_iter,
                plane_info_cap=cfg.tpu.lio_plane_info_cap)
            normal = jnp.where(res.match.valid[:, None], res.match.normal, 0.0)
            pg_pack = jnp.concatenate(
                [res.pts_w, normal, vmap_mod.sym6(res.var_w),
                 down_valid[:, None].astype(jnp.float32)], axis=-1)
            diag2 = jnp.stack([res.n_effective.astype(jnp.float32),
                               res.mean_residual,
                               _plane_cond(res.match, down_valid)])
            return pack_state(res.state, res.cov), pg_pack, diag2

        self._stage_jits = {
            "propagate": jax.jit(prop), "undistort": jax.jit(und),
            "downsample": jax.jit(down), "lio": jax.jit(lio),
        }

    def _run_frame_staged(self, imu_pack, pts_pack, img_dev, fid, use_vio):
        """One frame as blocking per-stage programs, returning (diag,
        pg_pack, {stage}_ms dict). Map insert runs before VIO (the
        reference's order — compare against deferred_map_insert=False
        runs for parity)."""
        if self._stage_jits is None:
            self._build_stage_jits()
        times = {}

        def run(name, fn, *a):
            t0 = time.perf_counter()
            out = fn(*a)
            jax.block_until_ready(out)
            times[name + "_ms"] = (time.perf_counter() - t0) * 1e3
            return out

        packed_prop, pose_tab = run(
            "propagate", self._stage_jits["propagate"], self.packed, imu_pack)
        und_pts = run("undistort", self._stage_jits["undistort"],
                      packed_prop, pose_tab, pts_pack)
        down_pts, down_valid = run(
            "downsample", self._stage_jits["downsample"], und_pts, pts_pack)
        self.packed, pg_pack, diag2 = run(
            "lio", self._stage_jits["lio"], packed_prop, self.vmap_state,
            down_pts, down_valid)
        self.vmap_state = run("map", self._map_jit, self.vmap_state, pg_pack)
        diag = jnp.zeros((6,), jnp.float32).at[0:2].set(diag2[0:2])
        diag = diag.at[5].set(diag2[2])
        if use_vio:
            self.packed, self.pool, self.ring, vdiag = run(
                "vio", self._vio_half_jit, self.packed, self.pool,
                self.ring, self.vmap_state, img_dev, pg_pack, fid)
            diag = diag.at[2:5].set(vdiag)
        return diag, pg_pack, times

    # ---------- host orchestration ----------

    def _init_imu(self, seq, t_until: float):
        m = seq.imu_stamps <= t_until
        if m.sum() < max(self.cfg.imu.imu_int_frame, 5):
            return False
        grav, mean_norm = imu_mod.static_init(seq.imu_acc[m], seq.imu_gyr[m])
        if self.cfg.uav.gravity_align_en:
            # Align the world frame with gravity (uav/gravity_align_en):
            # choose R0 s.t. R0-rotated gravity is exactly [0,0,-G].
            g = grav / np.linalg.norm(grav)
            tgt = np.array([0.0, 0.0, -1.0])
            axis = np.cross(g, tgt)
            s_n = np.linalg.norm(axis)
            if s_n > 1e-8:
                axis = axis / s_n
                ang = float(np.arctan2(s_n, float(g @ tgt)))
                R0 = np.asarray(so3.exp(jnp.asarray(axis * ang, jnp.float32)))
            else:
                R0 = np.eye(3, dtype=np.float32)
            st, cv = unpack_state(self.packed)
            self.packed = pack_state(
                st._replace(rot=jnp.asarray(R0, jnp.float32),
                            grav=jnp.asarray([0.0, 0.0, -9.81], jnp.float32)),
                cv,
            )
        else:
            st, cv = unpack_state(self.packed)
            self.packed = pack_state(st._replace(grav=jnp.asarray(grav)), cv)
        self.noise = imu_mod.make_noise(
            acc_cov=self.cfg.imu.acc_cov, gyr_cov=self.cfg.imu.gyr_cov,
            b_acc_cov=self.cfg.imu.b_acc_cov, b_gyr_cov=self.cfg.imu.b_gyr_cov,
            inv_expo_cov=self.cfg.vio.inv_expo_cov, mean_acc_norm=mean_norm,
            # Estimation toggles (imu/gravity_est_en, imu/ba_bg_est_en,
            # vio/exposure_estimate_en -> ImuProcess::disable_*,
            # LIVMapper.cpp:158-160): 0/1 gates on the F/Q blocks.
            est_bias=self.cfg.imu.ba_bg_est_en,
            est_gravity=self.cfg.imu.gravity_est_en,
            est_exposure=self.cfg.vio.exposure_estimate_en,
        )
        self.imu_inited = True
        return True

    def _imu_slice(self, t0: float, t1: float, seq):
        """IMU samples needed for propagation over (t0, t1]: the last
        sample at/before t0 plus everything in (t0, t1] + one beyond."""
        s = seq.imu_stamps
        i0 = int(np.searchsorted(s, t0, side="right")) - 1
        i1 = int(np.searchsorted(s, t1, side="right")) + 1
        i0 = max(i0, 0)
        i1 = min(i1, len(s))
        return s[i0:i1], seq.imu_gyr[i0:i1], seq.imu_acc[i0:i1]

    def _prepare_packet(self, t_end: float, seq):
        """Host-side ragged->fixed batching of one frame's inputs.

        Advances the packet cursor `_packet_t0` (NOT last_update_time —
        prefetching may run this one event ahead of processing; the
        public last_update_time only moves when the event runs)."""
        cfg = self.cfg.tpu
        t0 = (self._packet_t0 if self._packet_t0 is not None
              else self.last_update_time)
        if self.slam_mode == "only_lo":
            imu_pack = self._put(np.float32(t_end - t0))
        else:
            st, gy, ac = self._imu_slice(t0, t_end, seq)
            b = imu_mod.prepare_imu_batch(st, gy, ac, t0, t_end,
                                          cfg.max_imu_per_packet)
            # assemble on host, ship in ONE h2d (was 6 device dispatches)
            imu_pack = self._put(np.concatenate(
                [b.gyr, b.acc, b.dt[:, None], b.offs_end[:, None],
                 b.valid[:, None]], axis=-1, dtype=np.float32))

        # Chunks are time-sorted (push_scan sorts within a scan, the
        # pending list is kept ordered by first timestamp), so one
        # searchsorted splits each straddling chunk and the scan stops at
        # the first fully-future chunk — O(points consumed) per frame.
        # The old per-chunk masking re-copied EVERY future chunk every
        # frame: O(total buffered points), measured ~28 ms/frame host
        # time on the avia-scale bench. Multiple chunks may straddle
        # t_end (overlapping sensors), so every chunk whose first point
        # is <= t_end is visited, and the leftover heads re-merge sorted.
        take_p, take_t = [], []
        leftovers = []
        ci = 0
        while ci < len(self.pending):
            pts, t_abs = self.pending[ci]
            if len(t_abs) and t_abs[0] > t_end:
                break
            if not len(t_abs) or t_abs[-1] <= t_end:
                take_p.append(pts)
                take_t.append(t_abs)
            else:
                i = int(np.searchsorted(t_abs, t_end, side="right"))
                take_p.append(pts[:i])
                take_t.append(t_abs[:i])
                leftovers.append((pts[i:], t_abs[i:]))
            ci += 1
        if ci:
            tail = leftovers + self.pending[ci:]
            if len(leftovers) > 1 or (leftovers and self.pending[ci:]):
                tail.sort(key=lambda c: c[1][0] if len(c[1]) else np.inf)
            self.pending = tail
        n = cfg.max_points_per_scan
        if take_p:
            pts = np.concatenate(take_p)
            offs = np.concatenate(take_t) - t0
            if len(pts) > n:
                # Overflow: decimate EVENLY to exactly n points (the
                # reference's point_filter_num style, but budget-exact).
                # Points are time-sorted since r3, so a head-truncate
                # would keep only the sweep's first azimuth wedge —
                # measured 10x worse drift on capped outdoor scans.
                idx = (np.arange(n, dtype=np.int64) * len(pts)) // n
                pts = pts[idx]
                offs = offs[idx]
            k = len(pts)
        else:
            pts = np.zeros((0, 3), np.float32)
            offs = np.zeros((0,), np.float32)
            k = 0
        self._packet_t0 = t_end
        if cfg.wire_q16:
            dur = max(float(t_end - t0), 1e-6)
            scale = max(float(np.abs(pts[:k]).max()) if k else 0.0, 1e-3) / 32766.0
            # meta rides as the last two int16 rows of the SAME array
            # (bitcast f32 -> 2x int16): one h2d per packet instead of
            # two — each put is a relay RPC on this link.
            q = np.zeros((n + 2, 4), np.int16)
            q[:k, 0:3] = np.clip(np.round(pts[:k] / scale), -32766, 32766)
            q[:k, 3] = np.clip(np.round(offs[:k] / dur * 65535.0),
                               0, 65535).astype(np.uint16).view(np.int16)
            q[n:] = np.array([scale, dur, k, 0.0],
                             np.float32).view(np.int16).reshape(2, 4)
            return imu_pack, self._put(q)
        pack = np.zeros((n, 5), np.float32)
        pack[:k, 0:3] = pts[:k]
        pack[:k, 3] = offs[:k]
        pack[:k, 4] = 1.0
        return imu_pack, self._put(pack)

    # ---------- streaming ingestion (push/poll) ----------

    def push_imu(self, stamps, gyr, acc):
        """Append IMU samples (imu_cbk, LIVMapper.cpp:769-818). Arrays or
        scalars; stamps must be monotonically increasing overall.
        Non-finite rows and loop-backs (stamps at/before the newest
        buffered sample — the reference clears buffers on loop-back,
        :789-795; offline we drop the stale rows) are rejected and
        counted in `dropped_inputs`."""
        t = np.atleast_1d(np.asarray(stamps, np.float64))
        g = np.atleast_2d(np.asarray(gyr, np.float64))
        a = np.atleast_2d(np.asarray(acc, np.float64))
        if (self.cfg.common.ros_driver_bug_fix and len(t)
                and np.isfinite(self._scan_horizon)):
            # Vendor-driver clock fix (common/ros_driver_bug_fix,
            # imu_cbk LIVMapper.cpp:779-784): some drivers stamp the IMU
            # a whole number of seconds off the LiDAR clock; round the
            # offset away. No-op when the streams agree (|dt| < 0.5 s).
            t = t + np.round(self._scan_horizon - t)
        ok = (np.isfinite(t) & np.isfinite(g).all(axis=-1)
              & np.isfinite(a).all(axis=-1))
        if len(self._imu_t):
            ok &= t > self._imu_t[-1]
        if not ok.all():
            self.dropped_inputs["imu"] += int((~ok).sum())
            t, g, a = t[ok], g[ok], a[ok]
        self._imu_t = np.concatenate([self._imu_t, t])
        self._imu_gyr = np.concatenate([self._imu_gyr, g])
        self._imu_acc = np.concatenate([self._imu_acc, a])
        if self.keyframe_every:
            # Host-side history for backend IMU-link preintegration
            # (survives _trim_imu; trimmed to the keyframe horizon at
            # submit time). ~28 B/sample at 200 Hz — negligible.
            self._imu_hist.append((t, g, a))

    def push_scan(self, t_begin: float, pts: np.ndarray, offs: np.ndarray):
        """Append one decoded scan (livox/standard_pcl_cbk -> Preprocess,
        LIVMapper.cpp:703-766). Applies the optional LOAM surf-feature
        path (feature_extract_enabled -> give_feature,
        preprocess.cpp:746-980) so only planar points feed the filter."""
        if len(pts):
            # Corrupt-packet guards (round-2 A2 hardening): drop
            # non-finite rows; truncate scans beyond the configured pad
            # size (an oversized packet would silently truncate at
            # _prepare_packet anyway — account for it here instead).
            finite = np.isfinite(pts).all(axis=-1) & np.isfinite(offs)
            if not finite.all():
                self.dropped_inputs["lidar_nan"] += int((~finite).sum())
                pts, offs = pts[finite], offs[finite]
            cap = 4 * self.cfg.tpu.max_points_per_scan
            if len(pts) > cap:
                self.dropped_inputs["lidar_oversize"] += len(pts) - cap
                pts, offs = pts[:cap], offs[:cap]
        if self.cfg.preprocess.feature_extract_enabled and len(pts):
            keep = lidar_mod.extract_surf_features(
                pts, offs, blind=self.cfg.preprocess.blind)
            pts, offs = pts[keep], offs[keep]
        if len(offs) and np.any(np.diff(offs) < 0):
            # time-sort within the scan (multi-line sweeps interleave
            # offsets): _prepare_packet splits chunks by searchsorted.
            order = np.argsort(offs, kind="stable")
            pts, offs = pts[order], offs[order]
        chunk = (pts, t_begin + offs)
        if (self.pending and len(chunk[1]) and len(self.pending[-1][1])
                and chunk[1][0] < self.pending[-1][1][0]):
            # out-of-order push: keep the pending list ordered by first
            # timestamp (the packet splitter relies on it)
            import bisect

            keys = [c[1][0] if len(c[1]) else np.inf for c in self.pending]
            self.pending.insert(bisect.bisect_right(keys, chunk[1][0]),
                                chunk)
        else:
            self.pending.append(chunk)
        t_end = t_begin + (offs[-1] if len(offs) else 0.0)
        self._scan_horizon = max(self._scan_horizon, t_end)
        if not self._use_images:
            # ordered insert for the same reason: a late scan must not
            # enqueue a backwards event (the sync cursor is monotonic)
            if self._scan_events and t_end < self._scan_events[-1]:
                import bisect

                bisect.insort(self._scan_events, t_end)
            else:
                self._scan_events.append(t_end)

    def push_image(self, t: float, img: np.ndarray):
        """Append one camera frame (img_cbk, LIVMapper.cpp:829-860).
        The event (stream-cut) time is the capture time = stamp +
        exposure_time_init (sync_packages, LIVMapper.cpp:949-1010); the
        per-image img_time_offset is applied at ingestion by
        io.dataset.load_sequence, mirroring img_cbk :847.

        Frames queue on the HOST as u8 and ship to the device a bounded
        window ahead (`_ship_images`): the async h2d still overlaps the
        previous frames' compute, but a long offline sequence no longer
        parks every image in HBM at once. Images pushed into a camera-less
        mode ('only_lio'/'only_lo') are dropped and counted — those modes
        cut events at scan ends, not image times (slam_mode contract)."""
        if self.slam_mode != "livo":
            self.dropped_inputs["image_mode"] += 1
            return
        if not self._use_images:
            self._empty_img = None  # placeholder shape flips with mode
        self._use_images = True
        if isinstance(img, np.ndarray) and img.dtype != np.uint8:
            img = np.clip(img, 0, 255).astype(np.uint8)
        self._img_queue.append(
            (t + self.cfg.time_offset.exposure_time_init, img))
        self._ship_images()

    def _ship_images(self):
        """Device-upload the first few queued host frames (bounded HBM
        residency window; the uploads are async and overlap compute)."""
        for i in range(min(self.cfg.tpu.img_upload_ahead,
                           len(self._img_queue))):
            t_i, im = self._img_queue[i]
            if isinstance(im, np.ndarray):
                self._img_queue[i] = (t_i, self._put(im))

    def _event_ready(self, t_ev: float, is_image: bool) -> bool:
        """sync_packages admission: IMU must extend past the cut time and
        (for image cuts) LiDAR data must cover the capture time
        (LIVMapper.cpp:949-1010 wait conditions)."""
        if self.slam_mode != "only_lo":
            if not len(self._imu_t) or self._imu_t[-1] <= t_ev:
                return False
        return not is_image or self._scan_horizon >= t_ev

    def _imu_buf(self):
        class _V:
            imu_stamps = self._imu_t
            imu_gyr = self._imu_gyr
            imu_acc = self._imu_acc
        return _V()

    def poll(self, max_frames: Optional[int] = None, progress: bool = False,
             flush: bool = False) -> int:
        """Drain ready events: run one full frame update per image (LIVO)
        or per scan end (LIO modes) whose input streams have arrived.
        `flush=True` = end of stream, process the tail regardless of
        coverage (offline replay). Returns the number of frames run."""
        n_done = 0
        while max_frames is None or n_done < max_frames:
            if self._use_images:
                if not self._img_queue:
                    break
                t_ev, img = self._img_queue[0]
            else:
                if not self._scan_events:
                    break
                t_ev, img = self._scan_events[0], None
            if not flush and not self._event_ready(t_ev, img is not None):
                break
            (self._img_queue if self._use_images else self._scan_events).pop(0)
            if self._run_event(t_ev, img, progress=progress):
                n_done += 1
        return n_done

    def _prefetch_next(self):
        """Speculatively run _prepare_packet for the next queued event if
        its input streams are complete (safe: events process in order and
        sensors push monotonically, so the consumed pending state is
        exactly what the event will need)."""
        if self._prefetch is not None or not (self.imu_inited
                                              and self.map_inited):
            return
        q = self._img_queue if self._use_images else self._scan_events
        if not q:
            return
        t_nxt = q[0][0] if self._use_images else q[0]
        if not self._event_ready(t_nxt, self._use_images):
            return
        self._prefetch = (
            t_nxt, self._prepare_packet(t_nxt, self._imu_buf()))

    def _trim_imu(self):
        """Drop consumed IMU samples (the reference pops its imu deque as
        packets consume it, LIVMapper.cpp:884-1119). Keeps two samples at
        or before last_update_time — one more than `_imu_slice` needs —
        so propagation, prefetch (whose cursor runs ahead), and IMU-rate
        odometry all still see their interval-start sample. Bounds live
        buffer memory and the per-push concatenate cost over long runs."""
        if self.last_update_time is None or not len(self._imu_t):
            return
        i0 = int(np.searchsorted(self._imu_t, self.last_update_time,
                                 side="right")) - 2
        if i0 > 0:
            self._imu_t = self._imu_t[i0:]
            self._imu_gyr = self._imu_gyr[i0:]
            self._imu_acc = self._imu_acc[i0:]
        # Bound the backend-link IMU history to the refine-window horizon
        # even when _build_links never runs (advisor r4: with
        # keyframe_every set but refinement off, the history leaked
        # ~5.6 KB/s forever). Whole chunks older than the oldest keyframe
        # the next window could use are dropped — O(1) per call, no
        # concatenation.
        if self._imu_hist and self.keyframe_every:
            kfs = self._keyframes[-self.refine_window_size:]
            lo = (kfs[0][0] if kfs else self.last_update_time) - 2.0
            while (len(self._imu_hist) > 1
                   and len(self._imu_hist[0][0])
                   and self._imu_hist[0][0][-1] < lo):
                self._imu_hist.pop(0)

    def imu_rate_poses(self, t_until: Optional[float] = None):
        """IMU-rate odometry between frame updates: forward-only
        propagation of the last posterior through the buffered IMU
        samples in (last_update_time, t_until] — the 250 Hz
        imu_prop_callback (LIVMapper.cpp:576-635). Returns
        [(t, R (3,3), p (3,), v (3,)), ...] at IMU sample times."""
        if not self.imu_inited or self.last_update_time is None \
                or not len(self._imu_t):
            return []
        t0 = self.last_update_time
        t1 = self._imu_t[-1] if t_until is None else t_until
        if t1 <= t0:
            return []
        st, gy, ac = self._imu_slice(t0, t1, self._imu_buf())
        batch = imu_mod.prepare_imu_batch(
            st, gy, ac, t0, t1, self.cfg.tpu.max_imu_per_packet)
        state, _ = unpack_state(self.packed)
        offs_end, R, p, v, valid = imu_mod.imu_rate_odometry(
            state, batch, self.noise)
        keep = np.asarray(valid) > 0.5
        offs_end = np.asarray(offs_end)[keep]
        R, p, v = np.asarray(R)[keep], np.asarray(p)[keep], np.asarray(v)[keep]
        return [(t0 + float(o), R[i], p[i], v[i])
                for i, o in enumerate(offs_end)]

    def process(self, seq, max_frames: Optional[int] = None,
                progress: bool = False):
        """Run an offline sequence (io.synthetic.SyntheticSequence or the
        npz reader's equivalent): push every packet, then drain with
        flush semantics. Returns the TUM-style trajectory list
        [(t, R (3,3) np, p (3,) np), ...]."""
        use_imgs = self.slam_mode == "livo" and len(seq.images) > 0
        if use_imgs != self._use_images:
            self._empty_img = None
        self._use_images = use_imgs
        for t_begin, pts, offs in seq.scans:
            self.push_scan(t_begin, pts, offs)
        self.pending.sort(key=lambda x: x[1][0] if len(x[1]) else 1e18)
        self.push_imu(seq.imu_stamps, seq.imu_gyr, seq.imu_acc)
        if self._use_images:
            for t, img in seq.images:
                self.push_image(t, img)
        self.poll(max_frames=max_frames, progress=progress, flush=True)
        self._finalize_host_views()
        return self.trajectory

    def _run_event(self, t_ev: float, img, progress: bool = False) -> bool:
        """One sync cut: IMU init bootstrap, or a full frame update
        (the body of the reference's run loop after sync_packages)."""
        if not self.imu_inited:
            if self.slam_mode == "only_lo":
                # No IMU: constant-velocity model from the first scan.
                self.noise = imu_mod.make_noise(
                    acc_cov=self.cfg.imu.acc_cov,
                    gyr_cov=self.cfg.imu.gyr_cov,
                )
                self.imu_inited = True
                self.last_update_time = t_ev
                return False
            if not self._init_imu(self._imu_buf(), t_ev):
                return False
            self.last_update_time = t_ev
            # drop sensor data before init end
            self.pending = [
                (p[t > t_ev], t[t > t_ev]) for p, t in self.pending
            ]
            return False

        if self.last_update_time is not None and t_ev <= self.last_update_time:
            # A late-arriving sensor packet enqueued an event at/behind
            # the sync cursor (the reference clears buffers on loop-back,
            # LIVMapper.cpp:710-795; offline we drop and count — the
            # cursor is monotonic, a backwards packet would corrupt the
            # propagation span).
            self.dropped_inputs["stale_event"] = (
                self.dropped_inputs.get("stale_event", 0) + 1)
            return False

        t_frame0 = time.perf_counter()
        if self.state_trace_en:
            self.trace_pre.append((t_ev, self.packed))
        first = not self.map_inited
        # IMU-rate odometry over the interval this frame closes: what a
        # consumer polled at IMU rate between the previous update and now
        # (uav/imu_rate_odom, the 250 Hz timer at LIVMapper.cpp:576-635).
        # Emitted from the PREVIOUS posterior, before last_update_time
        # advances below.
        if self.cfg.uav.imu_rate_odom and self.slam_mode != "only_lo" \
                and not first:
            self.imu_rate_trajectory.extend(
                (t, R, p) for t, R, p, _ in self.imu_rate_poses(t_until=t_ev))
        if self._prefetch is not None and self._prefetch[0] == t_ev:
            imu_pack, pts_pack = self._prefetch[1]
            self._prefetch = None
        else:
            self._prefetch = None  # stale speculation cannot occur (events
            # process in order and the packet prep consumed pending state),
            # but guard anyway
            imu_pack, pts_pack = self._prepare_packet(t_ev, self._imu_buf())
        self.last_update_time = t_ev
        use_vio = self._use_images and img is not None and not first
        if use_vio:
            img_u8 = (img if img.dtype == np.uint8
                      else np.clip(img, 0, 255).astype(np.uint8))
            img_dev = (self._put(img_u8) if isinstance(img_u8, np.ndarray)
                       else img_u8)
        else:
            # cached placeholder: a fresh jnp.zeros would be one device
            # dispatch per frame on the remote link
            if self._empty_img is None:
                shape = ((self.cam.height, self.cam.width)
                         if self._use_images else (1, 1))
                self._empty_img = self._put(np.zeros(shape, np.uint8))
            img_dev = self._empty_img
        fid = self._put(np.int32(self.frame_id))
        is_kf = (bool(self.keyframe_every) and not first
                 and self.frame_id % self.keyframe_every == 0)
        staged = (self.cfg.tpu.stage_timing and not first
                  and self.slam_mode != "only_lo")
        defer_map = (self.cfg.tpu.deferred_map_insert and not first
                     and not staged and "map" not in _SKIP)
        stage_times = None
        vdiag = None
        if staged:
            diag, pg_pack, stage_times = self._run_frame_staged(
                imu_pack, pts_pack, img_dev, fid, use_vio)
        elif use_vio and not self.cfg.tpu.fused_frame:
            (self.packed, self.vmap_state, self.pool, self.ring, diag,
             pg_pack) = self._frame_jit(
                self.packed, self.vmap_state, self.pool, self.ring,
                imu_pack, pts_pack, img_dev, fid,
                first=first, use_vio=False, emit_pg=True,
                do_map=not defer_map,
            )
            (self.packed, self.pool, self.ring,
             vdiag) = self._vio_half_jit(
                self.packed, self.pool, self.ring, self.vmap_state,
                img_dev, pg_pack, fid,
            )
            # vdiag merges into diag[2:5] host-side at finalize — an
            # .at[].set here would be one extra device dispatch per frame
        else:
            emit_pg = (self.pcd_accumulate or defer_map or is_kf
                       or self.cfg.publish.pub_effect_point_en)
            out = self._frame_jit(
                self.packed, self.vmap_state, self.pool, self.ring,
                imu_pack, pts_pack, img_dev, fid,
                first=first, use_vio=use_vio, emit_pg=emit_pg,
                do_map=not defer_map,
            )
            (self.packed, self.vmap_state, self.pool, self.ring,
             diag) = out[:5]
            pg_pack = out[5] if emit_pg else None
        if defer_map:
            # Tail program: queued after the pose-producing calls, so
            # blocking on the pose does not wait for the insert, while
            # the next frame's programs (queued later) see the updated
            # map.
            self.vmap_state = self._map_jit(self.vmap_state, pg_pack)
        self.map_inited = True
        if (self.cfg.publish.pub_effect_point_en and not first
                and pg_pack is not None):
            self._effect_chunks.append((t_ev, pg_pack))
        if self.pcd_accumulate and not first and pg_pack is not None:
            # Colored world-map accumulation (savePCD,
            # LIVMapper.cpp:484-532): the downsampled undistorted
            # POSTERIOR world points this frame contributed to the map,
            # colorized from the frame image when one exists (XYZRGB),
            # else kept as geometry-only (the reference's XYZI path).
            pts_w = pg_pack[:, 0:3]
            pvalid = pg_pack[:, 12] > 0.5
            if use_vio:
                st, _ = unpack_state(self.packed)
                colors, vis = self._colorize_jit(img_dev, pts_w, pvalid, st)
                keep = vis
            else:
                colors, keep = None, pvalid
            self._cloud_chunks.append(
                (pts_w, colors, keep, self.packed[9:12]))
        # Sliding check: a synchronous d2h here would stall the
        # pipeline (~100 ms on remote links). Instead each check
        # consumes the position snapshot STARTED at the previous check
        # (already on host — no stall) and kicks off the next async
        # copy; the 10-frame decision lag is harmless because crossing
        # sliding_thresh takes many frames.
        if self.cfg.local_map.map_sliding_en and self.frame_id % 10 == 0:
            snap = self._pos_snapshot
            self._pos_snapshot = self.packed[9:12]
            try:
                self._pos_snapshot.copy_to_host_async()
            except AttributeError:
                pass  # CPU arrays
            if snap is not None:
                pos = np.asarray(snap)
                if np.linalg.norm(pos - self._last_slide_pos) > self.cfg.local_map.sliding_thresh:
                    self._last_slide_pos = pos
                    self.vmap_state = self._slide_jit(
                        self.vmap_state, jnp.asarray(pos)
                    )
        # One-ahead packet prefetch: build + ship the NEXT ready event's
        # imu/points packet now, so its h2d transfer (the largest h2d on
        # the frame, ~0.6 MB f32) overlaps this frame's device compute
        # instead of sitting on the next frame's blocked critical path.
        self._prefetch_next()
        self._ship_images()
        self._trim_imu()
        # Host-vs-device split: everything up to here is host prep +
        # async dispatch; the block below is device-completion wait.
        t_disp = time.perf_counter()
        if _BLOCK:
            jax.block_until_ready(self.packed)
        if self.state_trace_en:
            self.trace_post.append((t_ev, self.packed))
        self.frame_id += 1
        # Keep device arrays; converting here would force a blocking
        # device sync per frame (costly over a remote TPU link).
        self.trajectory.append((t_ev, self.packed))
        if is_kf:
            scan4 = (self._kf_scan_raw_jit(pts_pack) if self.kf_use_raw
                     else self._kf_scan_jit(self.packed, pg_pack))
            photo = None
            if (self.refine_photo and img_dev is not None
                    and pg_pack is not None):
                photo = self._capture_photo(img_dev, pg_pack)
            if self.refine_gate > 0.0:
                # one tiny d2h per keyframe: the degeneracy signal the
                # submit gate reads (diag[5] = plane conditioning)
                self._kf_conds.append(float(np.asarray(diag[5])))
            try:  # pre-warm the host copy the link builder will read
                self.packed.copy_to_host_async()
            except AttributeError:
                pass
            self._keyframes.append((t_ev, self.packed, scan4, photo))
            if self.online_refine and self._refiner is not None:
                self._consume_refine()
                k = len(self._keyframes)
                if (k >= self.refine_window_size
                        and k - self._last_refine_k >= self.refine_stride):
                    if self._submit_refine():
                        self._last_refine_k = k
        t_end = time.perf_counter()
        row = dict(
            t=t_ev, t_wall=t_end,
            lio_s=t_end - t_frame0, vio_s=0.0,
            host_ms=(t_disp - t_frame0) * 1e3,
            dev_wait_ms=(t_end - t_disp) * 1e3 if _BLOCK else 0.0,
            diag=diag,
            **(stage_times or {}),
        )
        if vdiag is not None:
            row["vdiag"] = vdiag
        self.log.add(**row)
        if progress and self.frame_id % 10 == 0:
            print(f"[livo] frame {self.frame_id} t={t_ev:.2f} "
                  f"pos={np.asarray(self.packed[9:12]).round(3)}")
        return True

    def _finalize_host_views(self):
        """Batch ALL device->host conversions into one packed transfer: on
        a remote TPU link d2h is latency-bound (~100 ms per transfer of
        any size), so per-frame conversions would dwarf the compute."""
        if self.online_refine:
            self._consume_refine(force=True)  # drain the in-flight window
        new_idx = [i for i, row in enumerate(self.trajectory)
                   if len(row) == 2]
        if not new_idx:
            return
        stacked = jnp.stack([self.trajectory[i][1][0:12] for i in new_idx])
        diag_rows = [r for r in self.log.rows if "diag" in r]
        diags = (jnp.stack([r["diag"] for r in diag_rows])
                 if diag_rows else None)
        host = np.asarray(stacked)  # single d2h for poses
        host_diag = np.asarray(diags) if diags is not None else None
        vd_rows = [r for r in diag_rows if "vdiag" in r]
        host_vd = (np.asarray(jnp.stack([r["vdiag"] for r in vd_rows]))
                   if vd_rows else None)
        for j, i in enumerate(new_idx):
            t = self.trajectory[i][0]
            self.trajectory[i] = (
                t, host[j, 0:9].reshape(3, 3), host[j, 9:12]
            )
        for j, r in enumerate(vd_rows):
            r["_vd_host"] = host_vd[j]
        for j, r in enumerate(diag_rows):
            d = host_diag[j]
            vd = r.pop("_vd_host", None)
            if vd is not None:  # split-mode VIO half's diag columns
                d = np.concatenate([d[0:2], vd, d[5:6]])
            r.pop("diag")
            r.pop("vdiag", None)
            r.update(n_eff=int(d[0]), mean_res=float(d[1]),
                     n_tracked=int(d[2]), n_added=int(d[3]),
                     vio_err=float(d[4]), plane_cond=float(d[5]))

    def effect_points(self):
        """Per-frame effective points — the scan points that matched a
        map plane in the final LIO iteration (publish/pub_effect_point_en
        -> publish_effect_world, LIVMapper.cpp:446; the reference
        publishes them for rviz). Returns [(t, pts_w (M, 3) np)]."""
        out = []
        for t, pg in self._effect_chunks:
            a = np.asarray(pg)
            m = (a[:, 12] > 0.5) & (np.abs(a[:, 3:6]).sum(axis=1) > 0)
            out.append((t, a[m, 0:3]))
        return out

    def print_stage_table(self, last_n: Optional[int] = None) -> str:
        """Render the per-frame stage table (the reference's ANSI box
        tables, LIVMapper.cpp:465-476 / vio.cpp:1851-1868) from FrameLog
        rows. Per-stage columns exist when tpu.stage_timing is on;
        otherwise the host/device split rows still render. Returns the
        string (and prints it)."""
        from ..utils.timing import StageTable

        tab = StageTable("LIVO per-frame stages")
        stage_keys = ("propagate_ms", "undistort_ms", "downsample_ms",
                      "lio_ms", "map_ms", "vio_ms")
        has_stages = any("lio_ms" in r for r in self.log.rows)
        # host_ms already CONTAINS the blocking stage runs in
        # stage_timing mode — summing both would double-count the frame,
        # so the host/device split renders only when stages are absent.
        keys = stage_keys if has_stages else ("host_ms", "dev_wait_ms")
        for r in self.log.rows:
            got = False
            for k in keys:
                if k in r:
                    tab.mark(k.replace("_ms", ""), r[k] * 1e-3)
                    got = True
            if got:
                tab.end_frame()
        out = tab.render(last_n=last_n)
        print(out)
        return out

    def save_state_traces(self, pre_path: str, post_path: str):
        """Write pre/post-update state rows (t, euler deg, pos, vel, bg,
        ba, inv_expo) like Log/mat_pre.txt / mat_out.txt, batched into one
        device transfer per file."""
        from ..ops import so3 as so3_mod

        for path, trace in ((pre_path, self.trace_pre), (post_path, self.trace_post)):
            if not trace:
                continue
            rows = np.asarray(jnp.stack([v[0:25] for _, v in trace]))
            ts = np.array([t for t, _ in trace])
            out = np.zeros((len(rows), 16))
            for i, r in enumerate(rows):
                R = r[0:9].reshape(3, 3)
                out[i, 0:3] = np.asarray(so3_mod.euler_zyx(jnp.asarray(R))) * 57.3
                out[i, 3:6] = r[9:12]    # pos
                out[i, 6:9] = r[12:15]   # vel
                out[i, 9:12] = r[15:18]  # bias_g
                out[i, 12:15] = r[18:21] # bias_a
                out[i, 15] = r[24]       # inv exposure
            np.savetxt(path, np.column_stack([ts, out]), fmt="%.6f")

    def save_images(self, out_dir: str, overlay: bool = True):
        """Dump the reference-frame ring buffer as PNGs, optionally with
        tracked-point overlays: each valid visual map point is projected
        into the frame's camera pose and marked green (converged) or red
        (not yet) — the reference's plotTrackedPoints diagnostic
        (vio.cpp:1699-1740) and img_en image dump. Host-side, end-of-run
        (per the d2h cost model: no per-frame readbacks)."""
        from ..io import export as export_mod
        from ..models import camera as cam_mod2

        os.makedirs(out_dir, exist_ok=True)
        imgs = np.asarray(self.ring.imgs)
        ids = np.asarray(self.ring.ids)
        if overlay:
            pv = np.asarray(vio_mod.pool_point_valid(self.pool))
            pw = np.asarray(vio_mod.pool_pos(self.pool))[pv]
            conv = np.asarray(vio_mod.pool_converged(self.pool))[pv]
            Rci = np.asarray(self.Rci)
            Pci = np.asarray(self.Pci)
        h, w = imgs.shape[-2:]
        written = []
        for slot in np.argsort(ids):
            fid = int(ids[slot])
            if fid < 0:
                continue
            g = np.clip(imgs[slot], 0, 255)
            rgb = np.repeat(g[:, :, None], 3, axis=-1)
            if overlay and fid < len(self.trajectory) and len(pw):
                t, R, p = self.trajectory[fid]
                Rcw = Rci @ np.asarray(R).T
                pc = (pw - np.asarray(p)) @ Rcw.T + Pci
                front = pc[:, 2] > 0.1
                px = np.asarray(
                    cam_mod2.world2cam(self.cam, jnp.asarray(pc, jnp.float32))
                )
                u = np.round(px[:, 0]).astype(int)
                v = np.round(px[:, 1]).astype(int)
                ok = front & (u >= 2) & (u < w - 2) & (v >= 2) & (v < h - 2)
                for ui, vi, ci in zip(u[ok], v[ok], conv[ok]):
                    color = (0, 255, 0) if ci else (255, 80, 80)
                    rgb[vi - 1:vi + 2, ui - 1:ui + 2] = color
            path = os.path.join(out_dir, f"{fid:05d}.png")
            export_mod.write_png(path, rgb)
            written.append(path)
        return written

    def _collect_cloud(self):
        """One batched d2h of the accumulated colored world cloud:
        (pts (M, 3), rgb (M, 3) uint8 or None, per-chunk sensor
        positions (K, 3), chunk ids (M,))."""
        chunks = self._cloud_chunks
        if not chunks:
            return (np.zeros((0, 3), np.float32), None,
                    np.zeros((0, 3), np.float32), np.zeros(0, np.int32))
        has_color = chunks[0][1] is not None
        pts_d = jnp.concatenate([c[0] for c in chunks])
        keep_d = jnp.concatenate([c[2] for c in chunks])
        sens_d = jnp.stack([c[3] for c in chunks])
        pts = np.asarray(pts_d)
        keep = np.asarray(keep_d)
        sensors = np.asarray(sens_d)
        n = chunks[0][0].shape[0]
        chunk_id = np.repeat(np.arange(len(chunks), dtype=np.int32), n)
        rgb = None
        if has_color:
            cols = np.asarray(jnp.concatenate([c[1] for c in chunks]))
            if cols.shape[1] == 1:
                cols = np.repeat(cols, 3, axis=1)
            rgb = np.clip(cols, 0, 255).astype(np.uint8)
        return (pts[keep], rgb[keep] if rgb is not None else None,
                sensors, chunk_id[keep])

    def save_pcd(self, path: str, binary: bool = True):
        """Write the accumulated colored world cloud (savePCD,
        LIVMapper.cpp:484-532; enable with pcd_save/pcd_save_en). XYZRGB
        when images colorized the run, XYZ otherwise."""
        from ..io import export as export_mod

        pts, rgb, _, _ = self._collect_cloud()
        export_mod.write_pcd(path, pts, colors=rgb, binary=binary)
        return len(pts)

    def save_mesh(self, path: str, grid: int = 256, min_weight: float = 1.0):
        """Dense colored mesh of the accumulated cloud: TSDF integration
        per frame chunk (sensor origin = that frame's posterior
        position) -> marching tetrahedra -> vertex recoloring -> PLY
        (the reference's savePCD + scripts/mesh.py chain in one call)."""
        from ..io import tsdf as tsdf_mod

        pts, rgb, sensors, chunk_id = self._collect_cloud()
        if not len(pts):
            tsdf_mod.write_ply_mesh(path, np.zeros((0, 3)),
                                    np.zeros((0, 3), np.int32))
            return 0
        center = 0.5 * (pts.min(0) + pts.max(0))
        side = float((pts.max(0) - pts.min(0)).max()) * 1.1 + 1e-3
        vol = tsdf_mod.make_volume(center, side, grid=grid)
        for k in range(len(sensors)):
            m = chunk_id == k
            if not m.any():
                continue
            vol = tsdf_mod.integrate(
                vol, jnp.asarray(pts[m]), jnp.ones(int(m.sum()), bool),
                jnp.asarray(sensors[k], jnp.float32))
        verts, faces = tsdf_mod.extract_mesh(vol, min_weight=min_weight)
        colors = (tsdf_mod.colorize_vertices(verts, pts, rgb)
                  if rgb is not None and len(verts) else None)
        tsdf_mod.write_ply_mesh(path, verts, faces, colors)
        return len(faces)

    def export_colmap(self, out_dir: str):
        """COLMAP sparse-model text export of the camera trajectory and
        the visual map points (reference vio.cpp:128-143, :1762-1784,
        scripts/colmap_output.sh)."""
        from ..io import export as export_mod

        frames = []
        for i, (t, R, p) in enumerate(self.trajectory):
            Rcw = np.asarray(self.Rci) @ R.T
            t_cw = -Rcw @ p + np.asarray(self.Pci)
            # IMAGE_ID is 1-based (COLMAP convention); NAME matches the
            # 0-based frame-id filenames save_images dumps.
            frames.append((i + 1, Rcw, t_cw, f"{i:05d}.png"))
        pool_valid = np.asarray(vio_mod.pool_point_valid(self.pool))
        pts3d = np.asarray(vio_mod.pool_pos(self.pool))[pool_valid]
        export_mod.write_colmap(out_dir, self.cam, frames, points3d=pts3d)

    def enable_online_refine(self, keyframe_every: int = 10,
                             window: int = 16, stride: int = 8,
                             outer_iters: int = 2, gn_iters: int = 2,
                             feedback: bool = True, mesh=None,
                             photo: bool = False, gate: float = 0.0):
        """Turn on the online sliding-window backend (SURVEY §2.3 north
        star): collect a keyframe every `keyframe_every` frames, and
        every `stride` keyframes dispatch an asynchronous refinement of
        the last `window` keyframes (parallel/ba.OnlineRefiner). The
        device interleaves it with frame programs (or runs it on `mesh`'s
        devices); when a refinement completes, the newest keyframe's pose
        delta is fed back into the filter (small-delta gated) and refined
        keyframe poses accumulate in `refined_keyframes`.

        gate (VERDICT r4 weak #5): 0 = always-on; > 0 = degeneracy-gated
        engagement — a window is only submitted when some keyframe's
        plane-direction conditioning (smallest eigenvalue of the
        normalized matched-normal second moment, FrameLog `plane_cond`,
        in [0, 1/3]) dropped below the gate. A healthy filter then pays
        only a per-keyframe scalar check instead of the always-on
        backend's device time; degenerate windows engage immediately."""
        from ..parallel import ba

        self.keyframe_every = keyframe_every
        self.online_refine = True
        self.refine_window_size = window
        self.refine_stride = stride
        self.refine_feedback = feedback
        self.refine_photo = photo
        self.refine_gate = gate
        self._kf_conds: List = []
        self._refiner = ba.OnlineRefiner(
            self.map_cfg, outer_iters=outer_iters, gn_iters=gn_iters,
            dept_err=self.cfg.lio.dept_err, beam_err=self.cfg.lio.beam_err,
            mesh=mesh,
            cam=self.cam if photo else None, Rci=self.Rci, Pci=self.Pci,
            patch_size=self.vio_cfg.patch_size,
            photo_weight=1.0 / self.cfg.vio.img_point_cov,
        )

    def _kf_window(self, kfs):
        from ..parallel import ba

        rot = jnp.stack([kf[1][0:9].reshape(3, 3) for kf in kfs])
        pos = jnp.stack([kf[1][9:12] for kf in kfs])
        scans = jnp.stack([kf[2][:, 0:3] for kf in kfs])
        valid = jnp.stack([kf[2][:, 3] > 0.5 for kf in kfs])
        return ba.Window(rot=rot, pos=pos, scans=scans, valid=valid)

    def _capture_photo(self, img_dev, pg_pack):
        """Keyframe photometric-factor capture (one extra jitted program
        per keyframe, LIVO mode only): the frame's retrieval re-run at
        the posterior state with exposure-normalized reference targets
        (vio.capture_photo_factors). Returns device arrays
        (img u8, tau, pos, target, valid, scale)."""
        if self._kf_photo_jit is None:
            def cap(packed, pool, ring, img, pg):
                state, _ = unpack_state(packed)
                pos, tgt, val, scale = vio_mod.capture_photo_factors(
                    pool, ring, img.astype(jnp.float32), state,
                    pg[:, 0:3], pg[:, 12] > 0.5, self.cam, self.Rci,
                    self.Pci, self.vio_cfg)
                return pos, tgt, val, scale, state.inv_expo

            self._kf_photo_jit = jax.jit(cap)
        pos, tgt, val, scale, tau = self._kf_photo_jit(
            self.packed, self.pool, self.ring, img_dev, pg_pack)
        return (img_dev, tau, pos, tgt, val, scale)

    def _build_photo(self, kfs):
        """Stack per-keyframe captures into ba.PhotoFactors; None unless
        every keyframe in the window carried a capture."""
        from ..parallel import ba

        if not all(len(kf) > 3 and kf[3] is not None for kf in kfs):
            return None
        ph = [kf[3] for kf in kfs]
        return ba.PhotoFactors(
            img=jnp.stack([p[0] for p in ph]).astype(jnp.float32),
            inv_expo=jnp.stack([p[1] for p in ph]),
            pts_w=jnp.stack([p[2] for p in ph]),
            target=jnp.stack([p[3] for p in ph]),
            valid=jnp.stack([p[4] for p in ph]),
            scale=jnp.stack([p[5] for p in ph]),
        )

    def _submit_refine(self) -> bool:
        kfs = self._keyframes[-self.refine_window_size:]
        if self.refine_gate > 0.0:
            conds = self._kf_conds[-self.refine_window_size:]
            if conds and min(conds) >= self.refine_gate:
                # healthy window: skip the backend entirely (the check
                # re-runs at every subsequent keyframe, so degeneracy
                # engages within one keyframe of appearing)
                self.refine_gate_skips += 1
                return False
        window = self._kf_window(kfs)
        ts = [kf[0] for kf in kfs]
        links = self._build_links(kfs) if self.refine_imu_links else None
        factors = self._build_photo(kfs) if self.refine_photo else None
        ok = self._refiner.submit(window, links=links, photo=factors,
                                  meta=(ts, window.rot, window.pos))
        if ok:
            self.refine_submits += 1
        return ok

    def _build_links(self, kfs):
        """Preintegrated IMU links between consecutive keyframes
        (parallel/ba.ImuLinks) from the retained host IMU history, with
        velocities/biases/gravity read from the keyframe filter states
        (their host copies were started asynchronously at capture)."""
        from ..parallel import ba

        if not self._imu_hist:
            return None
        K = len(kfs)
        ts = np.array([kf[0] for kf in kfs])
        t_all = np.concatenate([h[0] for h in self._imu_hist])
        g_all = np.concatenate([h[1] for h in self._imu_hist])
        a_all = np.concatenate([h[2] for h in self._imu_hist])
        # trim history below the window (keep one stride of margin)
        lo = ts[0] - 2.0
        if len(t_all) and t_all[0] < lo - 10.0:
            keep = t_all >= lo
            self._imu_hist = [(t_all[keep], g_all[keep], a_all[keep])]
        # np.asarray on the FULL packed array reuses the host copy the
        # keyframe capture started asynchronously (a device-side [:24]
        # slice would force a fresh synchronous d2h per keyframe).
        states = [np.asarray(kf[1], np.float64)[:24] for kf in kfs]
        dR = np.tile(np.eye(3), (K, 1, 1))
        dp = np.zeros((K, 3))
        dts = np.full(K, 1e-3)
        vel = np.stack([st[12:15] for st in states])
        valid = np.zeros(K, bool)
        for k in range(K - 1):
            st = states[k]
            dRk, dpk, dtk = ba.preintegrate(
                t_all, g_all, a_all, st[15:18], st[18:21], ts[k], ts[k + 1])
            dR[k], dp[k], dts[k] = dRk, dpk, max(dtk, 1e-3)
            # a sample-free interval (dtk == 0 sentinel) must NOT become
            # an identity link asserting zero relative motion
            valid[k] = dtk > 1e-3
        grav = states[-1][21:24]
        f32 = jnp.float32
        return ba.ImuLinks(
            dR=jnp.asarray(dR, f32), dp=jnp.asarray(dp, f32),
            dt=jnp.asarray(dts, f32), vel=jnp.asarray(vel, f32),
            grav=jnp.asarray(grav, f32), valid=jnp.asarray(valid))

    def _consume_refine(self, force: bool = False):
        """Collect a completed refinement (non-blocking unless force) and
        apply the newest keyframe's delta to the live filter state."""
        if self._refiner is None:
            return
        out = self._refiner.poll(force=force)
        if out is None:
            return
        (ts, rot0_d, pos0_d), rot_r, pos_r = out
        rot0, pos0 = np.asarray(rot0_d), np.asarray(pos0_d)
        for i, t in enumerate(ts):
            self.refined_keyframes[t] = (rot_r[i], pos_r[i])
        if not self.refine_feedback:
            return
        R_d = rot_r[-1] @ rot0[-1].T
        p_d = pos_r[-1] - R_d @ pos0[-1]
        ang = np.degrees(np.arccos(np.clip((np.trace(R_d) - 1) / 2, -1, 1)))
        # Small-delta gate: the backend polishes drift, it must never be
        # able to yank the filter (a diverged refinement is dropped).
        if ang < 2.0 and np.linalg.norm(p_d) < 0.5:
            self.packed = self._apply_delta_jit(
                self.packed, jnp.asarray(R_d, jnp.float32),
                jnp.asarray(p_d, jnp.float32))
            self._refine_deltas.append((self.last_update_time, R_d, p_d))

    def refined_keyframe_trajectory(self):
        """[(t, R, p)] for every collected keyframe, with refined poses
        substituted where a window covered them (newest refinement
        wins) — the backend's smoothed trajectory output."""
        out = []
        for kf in self._keyframes:
            t, packed = kf[0], kf[1]
            if t in self.refined_keyframes:
                R, p = self.refined_keyframes[t]
            else:
                v = np.asarray(packed[0:12])
                R, p = v[0:9].reshape(3, 3), v[9:12]
            out.append((t, R, p))
        return out

    def refine_trajectory(self, outer_iters: int = 2, gn_iters: int = 3,
                          max_keyframes: int = 32, mesh=None,
                          imu_links: bool = True, photo: bool = None):
        """Post-run sliding-window refinement over the collected
        keyframes (their UNDISTORTED posterior body scans — see
        _kf_scan). Enable collection with `pipeline.keyframe_every = N`
        before process(). Returns [(t, R, p)] refined keyframe poses.
        imu_links adds preintegrated IMU factors between keyframes when
        IMU history is available (see parallel/ba.ImuLinks)."""
        from ..parallel import ba

        assert self._keyframes, "set keyframe_every before process()"
        kfs = self._keyframes[-max_keyframes:]
        window = self._kf_window(kfs)
        links = self._build_links(kfs) if imu_links else None
        use_photo = self.refine_photo if photo is None else photo
        factors = self._build_photo(kfs) if use_photo else None
        refined, n_used = ba.refine_window(
            window, self.map_cfg, outer_iters=outer_iters, gn_iters=gn_iters,
            dept_err=self.cfg.lio.dept_err, beam_err=self.cfg.lio.beam_err,
            mesh=mesh, imu_links=links,
            photo=factors, cam=self.cam, Rci=self.Rci, Pci=self.Pci,
            patch_size=self.vio_cfg.patch_size,
            photo_weight=1.0 / self.cfg.vio.img_point_cov,
        )
        R_np = np.asarray(refined.rot)
        p_np = np.asarray(refined.pos)
        return [(kf[0], R_np[i], p_np[i]) for i, kf in enumerate(kfs)]
