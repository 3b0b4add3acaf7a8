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

import time
from functools import partial
from typing import List, Optional, Tuple

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
from ..ops import so3
from ..utils.config import LIVOConfig
from . import imu as imu_mod
from . import lio as lio_mod
from . import vio as vio_mod
from . import voxel_map as vmap_mod
from .state import NavState, init_cov, init_state


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
    def __init__(self, cfg: LIVOConfig, slam_mode: str = "livo"):
        self.cfg = cfg
        self.slam_mode = slam_mode  # "livo" | "only_lio"
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
            raycast_en=cfg.vio.raycast_en,
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
        # device state
        self.state: NavState = init_state()
        self.cov = init_cov()
        self.vmap_state = vmap_mod.make_map(self.map_cfg)
        self.pool = vio_mod.make_pool(self.vio_cfg)
        self.ring = vio_mod.make_ring(self.vio_cfg, self.cam)

        self.noise: Optional[imu_mod.ImuNoise] = None
        self.imu_inited = False
        self.map_inited = False
        self.last_update_time: Optional[float] = None
        self.frame_id = 0
        self.pending: List[Tuple[np.ndarray, np.ndarray]] = []  # (pts, t_abs)
        self.trajectory: List[Tuple[float, np.ndarray, np.ndarray]] = []
        self.log = FrameLog()
        # Pre/post-update state traces (the reference's Log/mat_pre.txt /
        # mat_out.txt rows, LIVMapper.cpp:284-286, 479-481): device
        # snapshots, converted lazily by save_state_traces.
        self.trace_pre: List = []
        self.trace_post: List = []
        self.state_trace_en = cfg.evo.pose_output_en

        # Donate only the big map/pool/ring buffers; state and cov are tiny
        # and their trajectory snapshots must outlive the next frame.
        self._lio_jit = jax.jit(
            self._lio_step, static_argnames=("first",), donate_argnums=(2,),
        )
        self._vio_jit = jax.jit(self._vio_step, donate_argnums=(2, 3))
        self._colorize_jit = jax.jit(
            lambda img, pts, valid, state: vio_mod.colorize_points(
                img, pts, valid, state, self.cam, self.Rci, self.Pci,
                blind=self.cfg.publish.blind_rgb_points,
            )
        )
        # Colored world-map accumulation (pcd_save, LIVMapper.cpp:484-532)
        self.pcd_accumulate = cfg.pcd_save.pcd_save_en
        self._cloud_chunks: List = []
        # Local-map sliding (mapSliding, voxel_map.cpp:924-948)
        self._slide_jit = jax.jit(
            lambda m, c: vmap_mod.slide_map(
                m, c, cfg.local_map.half_map_size, self.map_cfg
            ),
            donate_argnums=(0,),
        )
        self._last_slide_pos = np.zeros(3)

    # ---------- jitted step bodies ----------

    def _lio_step(self, state, cov, vmap_state, imu_batch, pts, t_offs, valid,
                  first: bool):
        cfg = self.cfg
        if self.slam_mode == "only_lo":
            # IMU-less: constant-velocity model (Forward_without_imu).
            dt = imu_batch  # scalar packet duration in this mode
            state_prop, cov_prop = imu_mod.propagate_without_imu(
                state, cov, dt, self.noise
            )
            und = imu_mod.undistort_without_imu(pts, t_offs, dt, state_prop)
        else:
            state_prop, cov_prop, poses = imu_mod.propagate(
                state, cov, imu_batch, self.noise
            )
            und = imu_mod.undistort(pts, t_offs, poses, state_prop,
                                    self.ext_R, self.ext_T)
        down, down_valid = lio_mod.voxel_downsample(
            und, valid, cfg.preprocess.filter_size_surf, cfg.tpu.max_points_down
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
            vmap_state = vmap_mod.update_map(vmap_state, pts_w, var_w, down_valid, self.map_cfg)
            zeros3 = jnp.zeros_like(pts_w)
            diag = (jnp.asarray(0, jnp.int32), jnp.asarray(0.0))
            return (state_prop, cov_prop, vmap_state, pts_w, zeros3, var_w,
                    down_valid, diag)

        res = lio_mod.lio_update(
            state_prop, cov_prop, vmap_state, down, down_valid,
            self.ext_R, self.ext_T, self.map_cfg,
            dept_err=cfg.lio.dept_err, beam_err=cfg.lio.beam_err,
            max_iterations=cfg.lio.max_iterations,
        )
        vmap_state = vmap_mod.update_map(
            vmap_state, res.pts_w, res.var_w, down_valid, self.map_cfg
        )
        normal = jnp.where(res.match.valid[:, None], res.match.normal, 0.0)
        diag = (res.n_effective, res.mean_residual)
        return (res.state, res.cov, vmap_state, res.pts_w, normal, res.var_w,
                down_valid, diag)

    def _vio_step(self, state, cov, pool, ring, vmap_state, img, pg_w,
                  pg_normal, pg_var, pg_valid, frame_id):
        return vio_mod.vio_step(
            state, cov, pool, ring, vmap_state, img, pg_w, pg_normal, pg_var,
            pg_valid, frame_id, self.cam, self.Rci, self.Pci, self.vio_cfg,
            self.map_cfg, ray_table=self._ray_table,
        )

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
            self.state = self.state._replace(
                rot=jnp.asarray(R0, jnp.float32),
                grav=jnp.asarray([0.0, 0.0, -9.81], jnp.float32),
            )
        else:
            self.state = self.state._replace(grav=jnp.asarray(grav))
        self.noise = imu_mod.make_noise(
            acc_cov=self.cfg.imu.acc_cov, gyr_cov=self.cfg.imu.gyr_cov,
            b_acc_cov=self.cfg.imu.b_acc_cov, b_gyr_cov=self.cfg.imu.b_gyr_cov,
            inv_expo_cov=self.cfg.vio.inv_expo_cov, mean_acc_norm=mean_norm,
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

    def _run_lio_packet(self, t_end: float, seq, first: bool):
        cfg = self.cfg.tpu
        t0 = self.last_update_time
        if self.slam_mode == "only_lo":
            batch = jnp.asarray(np.float32(t_end - t0))
        else:
            st, gy, ac = self._imu_slice(t0, t_end, seq)
            batch = imu_mod.prepare_imu_batch(st, gy, ac, t0, t_end,
                                              cfg.max_imu_per_packet)

        # collect pending points with absolute time <= t_end
        take_p, take_t, rest = [], [], []
        for pts, t_abs in self.pending:
            m = t_abs <= t_end
            if m.any():
                take_p.append(pts[m])
                take_t.append(t_abs[m])
            if (~m).any():
                rest.append((pts[~m], t_abs[~m]))
        self.pending = rest
        if take_p:
            pts = np.concatenate(take_p)
            offs = np.concatenate(take_t) - t0
        else:
            pts = np.zeros((0, 3), np.float32)
            offs = np.zeros((0,), np.float32)
        p, o, v = _pad_points(pts, offs, cfg.max_points_per_scan)

        out = self._lio_jit(self.state, self.cov, self.vmap_state, batch, p, o, v,
                            first=first)
        (self.state, self.cov, self.vmap_state, pg_w, pg_normal, pg_var,
         pg_valid, diag) = out
        self.last_update_time = t_end
        return pg_w, pg_normal, pg_var, pg_valid, diag

    def process(self, seq, max_frames: Optional[int] = None,
                progress: bool = False):
        """Run an offline sequence (io.synthetic.SyntheticSequence or the
        npz reader's equivalent). Returns the TUM-style trajectory list
        [(t, R (3,3) np, p (3,) np), ...]."""
        for t_begin, pts, offs in seq.scans:
            self.pending.append((pts, t_begin + offs))
        self.pending.sort(key=lambda x: x[1][0] if len(x[1]) else 1e18)

        use_images = self.slam_mode == "livo" and len(seq.images) > 0
        if use_images:
            events = [(t, img) for t, img in seq.images]
        else:
            events = [(t + offs[-1] if len(offs) else t, None)
                      for t, pts, offs in seq.scans]
        n_done = 0
        pg_cache = None
        for t_ev, img in events:
            if max_frames is not None and n_done >= max_frames:
                break
            if not self.imu_inited:
                if self.slam_mode == "only_lo":
                    # No IMU: constant-velocity model from the first scan.
                    self.noise = imu_mod.make_noise(
                        acc_cov=self.cfg.imu.acc_cov,
                        gyr_cov=self.cfg.imu.gyr_cov,
                    )
                    self.imu_inited = True
                    self.last_update_time = t_ev
                    continue
                if not self._init_imu(seq, t_ev):
                    continue
                self.last_update_time = t_ev
                # drop sensor data before init end
                self.pending = [
                    (p[t > t_ev], t[t > t_ev]) for p, t in self.pending
                ]
                continue

            t_frame0 = time.perf_counter()
            if self.state_trace_en:
                self.trace_pre.append((t_ev, self.state))
            pg = self._run_lio_packet(t_ev, seq, first=not self.map_inited)
            first = not self.map_inited
            self.map_inited = True
            # Sliding check costs one d2h (latency-bound on remote links):
            # sample it every 10 frames — movement past sliding_thresh
            # takes many frames anyway.
            if self.cfg.local_map.map_sliding_en and self.frame_id % 10 == 0:
                pos = np.asarray(self.state.pos)
                if np.linalg.norm(pos - self._last_slide_pos) > self.cfg.local_map.sliding_thresh:
                    self._last_slide_pos = pos
                    self.vmap_state = self._slide_jit(self.vmap_state, self.state.pos)
            t_lio = time.perf_counter()

            n_trk = 0
            if use_images and img is not None and not first:
                pg_w, pg_normal, pg_var, pg_valid, diag = pg
                res = self._vio_jit(
                    self.state, self.cov, self.pool, self.ring, self.vmap_state,
                    jnp.asarray(img), pg_w, pg_normal, pg_var, pg_valid,
                    jnp.asarray(self.frame_id, jnp.int32),
                )
                self.state, self.cov = res.state, res.cov
                self.pool, self.ring = res.pool, res.ring
                n_trk = res.n_tracked  # device scalar; converted at end
                if self.pcd_accumulate:
                    colors, vis = self._colorize_jit(
                        jnp.asarray(img), pg_w, pg_valid, self.state
                    )
                    self._cloud_chunks.append((pg_w, colors, vis))
            t_vio = time.perf_counter()

            if self.state_trace_en:
                self.trace_post.append((t_ev, self.state))
            self.frame_id += 1
            n_done += 1
            # Keep device arrays; converting here would force a blocking
            # device sync per frame (costly over a remote TPU link).
            self.trajectory.append((t_ev, self.state.rot, self.state.pos))
            self.log.add(
                t=t_ev, t_wall=time.perf_counter(),
                lio_s=t_lio - t_frame0, vio_s=t_vio - t_lio,
                n_eff=pg[4][0] if not first else 0,
                n_tracked=n_trk,
            )
            if progress and n_done % 10 == 0:
                print(f"[livo] frame {n_done} t={t_ev:.2f} "
                      f"pos={np.asarray(self.state.pos).round(3)}")
        # Batch ALL device->host conversions into one packed transfer: on a
        # remote TPU link d2h is latency-bound (~100 ms per transfer of any
        # size), so per-frame conversions would dwarf the compute.
        new_idx = [i for i, (t, R, p) in enumerate(self.trajectory)
                   if not isinstance(R, np.ndarray)]
        if new_idx:
            f32 = jnp.float32
            Rs = jnp.stack([self.trajectory[i][1].reshape(9) for i in new_idx])
            ps = jnp.stack([self.trajectory[i][2] for i in new_idx])
            scal_rows = [r for r in self.log.rows
                         if not isinstance(r.get("n_eff", 0), int)]
            scal = (
                jnp.stack([
                    jnp.stack([jnp.asarray(r["n_eff"], f32),
                               jnp.asarray(r["n_tracked"], f32)])
                    for r in scal_rows
                ]) if scal_rows else jnp.zeros((0, 2), f32)
            )
            packed = np.asarray(
                jnp.concatenate([Rs, ps], axis=1)
            )  # single d2h for poses
            scal_np = np.asarray(scal) if scal_rows else None
            for j, i in enumerate(new_idx):
                t = self.trajectory[i][0]
                self.trajectory[i] = (
                    t, packed[j, :9].reshape(3, 3), packed[j, 9:12]
                )
            for j, r in enumerate(scal_rows):
                r["n_eff"] = int(scal_np[j, 0])
                r["n_tracked"] = int(scal_np[j, 1])
        return self.trajectory

    def save_pcd(self, path: str):
        """Write the accumulated colored world cloud (savePCD,
        LIVMapper.cpp:484-532), voxel-downsampled by filter_size_pcd
        (first-point-per-voxel for the colors)."""
        from ..io import export as export_mod

        if not self._cloud_chunks:
            raise ValueError("no accumulated cloud (set pcd_save.pcd_save_en)")
        pts = np.concatenate([np.asarray(p)[np.asarray(v)] for p, c, v in self._cloud_chunks])
        cols = np.concatenate([np.asarray(c)[np.asarray(v)] for p, c, v in self._cloud_chunks])
        leaf = self.cfg.pcd_save.filter_size_pcd
        keys = np.floor(pts / leaf).astype(np.int64)
        _, idx = np.unique(keys, axis=0, return_index=True)
        pts, cols = pts[idx], cols[idx]
        if cols.shape[1] == 1:
            cols = np.repeat(cols, 3, axis=1)
        export_mod.write_pcd(path, pts, colors=np.clip(cols, 0, 255).astype(np.uint32))
        return len(pts)

    def save_state_traces(self, pre_path: str, post_path: str):
        """Write pre/post-update state rows (t, euler deg, pos, vel, bg,
        ba, inv_expo) like Log/mat_pre.txt / mat_out.txt, batched into one
        device transfer per file."""
        from ..ops import so3 as so3_mod

        for path, trace in ((pre_path, self.trace_pre), (post_path, self.trace_post)):
            if not trace:
                continue
            packed = jnp.stack([
                jnp.concatenate([
                    so3_mod.euler_zyx(s.rot) * 57.3, s.pos, s.vel, s.bias_g,
                    s.bias_a, s.inv_expo[None],
                ]) for _, s in trace
            ])
            rows = np.asarray(packed)
            ts = np.array([t for t, _ in trace])
            np.savetxt(path, np.column_stack([ts, rows]), fmt="%.6f")

    def export_colmap(self, out_dir: str):
        """COLMAP sparse-model text export of the camera trajectory and
        the visual map points (reference vio.cpp:128-143, :1762-1784,
        scripts/colmap_output.sh)."""
        from ..io import export as export_mod

        frames = []
        for i, (t, R, p) in enumerate(self.trajectory):
            Rcw = np.asarray(self.Rci) @ R.T
            t_cw = -Rcw @ p + np.asarray(self.Pci)
            frames.append((i + 1, Rcw, t_cw, f"{i + 1:05d}.png"))
        pool_valid = np.asarray(self.pool.valid)
        pts3d = np.asarray(self.pool.pos)[pool_valid]
        export_mod.write_colmap(out_dir, self.cam, frames, points3d=pts3d)
