"""Distributed sliding-window map/pose refinement (new capability).

The reference is strictly causal: each scan is matched once against the
incremental map and never revisited (SURVEY.md §5: no checkpoint, no
backend). This module adds the north-star batch backend: a window of K
keyframes (pose + downsampled body-frame scan) is refined by alternating

  (1) map rebuild: all keyframes' world points accumulated into a fresh
      voxel plane map (one batched update_map over the flattened window);
  (2) pose refinement: per-keyframe 6-DoF Gauss-Newton against the shared
      map (vmapped over keyframes, each iteration one match_planes +
      6x6 solve).

The coupling between keyframes flows through the shared map, so step (2)
is embarrassingly parallel over keyframes — the distribution axis. On a
device mesh, shard the keyframe axis: step (2) runs fully parallel, and
step (1)'s scatter-adds into the replicated map become the only
cross-device reduction (inserted by XLA's SPMD partitioner — the
scaling-book recipe, see parallel/sharding.py). Scaling efficiency is
then bounded by the map-rebuild reduction, which is O(map), not O(window).

Use cases: trajectory smoothing after a run, loop-region polish, and
multi-host map building from partitioned sequences.
"""

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import voxel_map as vm
from ..core.lio import calc_body_cov
from ..ops import so3
from ..ops.precision import hi_precision


class Window(NamedTuple):
    """K keyframes with fixed-size downsampled scans."""

    rot: jnp.ndarray  # (K, 3, 3) world-from-body
    pos: jnp.ndarray  # (K, 3)
    scans: jnp.ndarray  # (K, N, 3) body-frame points
    valid: jnp.ndarray  # (K, N)


class ImuLinks(NamedTuple):
    """Preintegrated IMU links between consecutive keyframes (r4,
    VERDICT r3 item 6). Row k links keyframe k -> k+1 (last row is a
    placeholder gated by `valid`). These factors keep the window
    observable where the plane map is degenerate (corridors, sparse
    aerial maps): the map constrains only the directions its normals
    span; the IMU links constrain the rest.

    The preintegrated measurements are built from RAW IMU samples
    (host-side, `preintegrate`), bias-corrected with the filter's bias
    estimates; keyframe velocities and world gravity come from the
    filter state and are held fixed (pose-only refinement — the backend
    polishes poses, it does not re-estimate the IMU state)."""

    dR: jnp.ndarray  # (K, 3, 3) gyro preintegration R_k_from_k+1^meas
    dp: jnp.ndarray  # (K, 3) accel double integral, in keyframe-k frame
    dt: jnp.ndarray  # (K,) link duration
    vel: jnp.ndarray  # (K, 3) filter velocity at keyframe k (held fixed)
    grav: jnp.ndarray  # (3,) world gravity (held fixed)
    valid: jnp.ndarray  # (K,) bool, link k->k+1 exists


def preintegrate(stamps, gyr, acc, bg, ba_, t0, t1):
    """Midpoint preintegration of raw IMU over (t0, t1] (host, f64):
    returns (dR (3,3), dp (3,), dt). Mirrors the forward-propagation
    integrator (core/imu.propagate; reference IMU_Processing.cpp:322-439)
    without covariance — the backend weights links by noise-scaled
    scalars instead."""
    stamps = np.asarray(stamps, np.float64)
    m = (stamps > t0) & (stamps <= t1)
    ts = np.concatenate([[t0], stamps[m], [t1]])
    w = np.asarray(gyr, np.float64)[m] - bg
    a = np.asarray(acc, np.float64)[m] - ba_
    if len(w) == 0:
        # No samples in the interval: an identity link would wrongly
        # assert zero relative motion — callers must treat dt=0 links
        # as invalid (pipeline._build_links gates on n_samples).
        return np.eye(3), np.zeros(3), 0.0
    def _exp(v):
        th = np.linalg.norm(v)
        if th < 1e-12:
            return np.eye(3)
        k = v / th
        K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
        return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)

    dR = np.eye(3)
    dv = np.zeros(3)
    dp = np.zeros(3)
    # Integrate ALL len(ts)-1 sub-intervals, including the tail
    # [last sample, t1], holding the nearest sample over it (zero-order
    # hold). With keyframe times not aligned to IMU stamps the tail is
    # up to one IMU period; dropping it biased each position link by
    # ~|dv|*imu_period (advisor r4 finding).
    for k in range(len(ts) - 1):
        dt_k = ts[k + 1] - ts[k]
        j = min(k, len(w) - 1)
        ak = dR @ a[j]
        dp = dp + dv * dt_k + 0.5 * ak * dt_k * dt_k
        dv = dv + ak * dt_k
        dR = dR @ _exp(w[j] * dt_k)
    return dR, dp, t1 - t0


class PhotoFactors(NamedTuple):
    """Per-keyframe photometric factors (VERDICT r4 item 4): the
    reference's exposure-normalized sparse-direct measurement model
    (vio.cpp:1520-1688) as a pose factor in the window. Captured at
    keyframe time by vio.capture_photo_factors; the world points,
    reference targets and exposure stay FIXED — only the keyframe pose
    enters the residual

        r = tau_k * I_k(pi(Rcw (p_w - p_k))) - tau_ref * I_ref.

    Texture-rich / geometry-poor regimes (corridors — the exact case
    VIO exists for) are unobservable to plane + IMU factors along the
    degenerate direction; these factors close that null space. All
    arrays lead with the keyframe axis K, so they shard exactly like
    Window/ImuLinks."""

    img: jnp.ndarray      # (K, H, W) keyframe grayscale images
    inv_expo: jnp.ndarray  # (K,) tau_k at capture (held fixed)
    pts_w: jnp.ndarray    # (K, M, 3) tracked point world positions
    target: jnp.ndarray   # (K, M, ps^2) tau_ref * I_ref
    valid: jnp.ndarray    # (K, M)
    scale: jnp.ndarray    # (K, M) int32 sampling stride (search level)


def _photo_terms(rot, pos, ph, cam, Rci, Pci, ps: int, w_photo):
    """One keyframe's photometric contribution to (HtH, Htz) under the
    same left/world-frame perturbation as the plane factor."""
    from ..models import camera as cam_mod
    from ..ops import image as img_ops

    img_k, tau, pts_w, target, valid, scale = ph
    f = rot.dtype
    Rcw = Rci @ rot.T
    Pcw = Pci - Rcw @ pos
    pf = pts_w @ Rcw.T + Pcw
    px = cam_mod.world2cam(cam, pf)
    ok = valid & (pf[:, 2] > 1e-6) & cam_mod.in_frame(cam, px, 8)
    val, du, dv = img_ops.sample_patches_with_grad(img_k, px, scale, ps)
    r = tau * val - target  # (M, ps^2)
    inv_scale = 1.0 / scale.astype(f)
    Jimg = jnp.stack([du, dv], axis=-1) * (tau * inv_scale[:, None])[..., None]
    Jdpi = cam_mod.projection_jacobian(cam, pf)  # (M, 2, 3)
    Jpix = jnp.einsum("mpi,mij->mpj", Jimg, Jdpi)  # (M, ps^2, 3)
    # pf = Rcw (p_w - pos) + Pci: d pf/dδθ = Rcw skew(p_w - pos),
    # d pf/dδt = -Rcw (left/world-frame perturbation, as the plane term)
    Jth = jnp.einsum("mpj,mjk->mpk", Jpix,
                     jnp.einsum("jl,mlk->mjk", Rcw, so3.skew(pts_w - pos)))
    Jt = jnp.einsum("mpj,jk->mpk", Jpix, -Rcw)
    J6 = jnp.concatenate([Jth, Jt], axis=-1)  # (M, ps^2, 6)
    w = jnp.where(ok, w_photo, 0.0).astype(f)
    HtH_p = jnp.einsum("mpi,m,mpj->ij", J6, w, J6)
    Htz_p = -jnp.einsum("mpi,m,mp->i", J6, w, r)
    return HtH_p, Htz_p


def _world_points(window: Window):
    pts_w = jnp.einsum("kij,knj->kni", window.rot, window.scans) + window.pos[:, None, :]
    return pts_w


@hi_precision
def _refine_pose_one(rot, pos, scan, valid, vmap_state, map_cfg: vm.VoxelMapConfig,
                     iters: int, dept_err: float, beam_err: float,
                     nbr=None, photo=None, photo_ctx=None):
    """Per-keyframe 6-DoF Gauss-Newton against the shared plane map.

    nbr (optional): neighbor coupling for the IMU link factors —
    (rot_prev, pos_prev, link_prev..., rot_next, pos_next, link_next...)
    with the NEIGHBOR poses held fixed for this pass (Jacobi block
    update: every keyframe refines simultaneously against the previous
    outer iteration's neighbor poses, so the keyframe axis stays
    embarrassingly parallel / shardable; coupling converges through the
    outer alternation exactly like the shared map does)."""
    body_cov6 = vm.sym6(calc_body_cov(scan, dept_err, beam_err))

    def gn(carry, _):
        rot, pos = carry
        pts_w = scan @ rot.T + pos
        var_w6 = body_cov6  # pose-uncertainty-free weighting for the batch pass
        match = vm.match_planes(vmap_state, pts_w, var_w6, valid, map_cfg)
        use = match.valid & valid
        n = match.normal
        # r = n·(Exp(δθ) R p + t + δt) + d: dr/dδθ = ((R p) × n),
        # dr/dδt = n (left/world-frame perturbation).
        Jr = jnp.cross(pts_w - pos, n)  # (R p) x n
        H = jnp.concatenate([Jr, n], axis=-1)  # (N, 6)
        w = jnp.where(use, 1.0 / (1e-3 + match.sigma_plane + vm.quad6(body_cov6, n)), 0.0)
        HtH = jnp.einsum("ni,n,nj->ij", H, w, H) + jnp.eye(6) * 1e-6
        Htz = jnp.einsum("ni,n,n->i", H, w, -match.dist)

        if nbr is not None:
            (r_p, p_p, dR_p, dp_p, dt_p, v_p, ok_p,
             r_n, p_n, dR_n, dp_n, dt_n, v_k, ok_n,
             grav, w_rot, w_pos) = nbr
            f = rot.dtype
            okp = ok_p.astype(f)
            okn = ok_n.astype(f)
            Z = jnp.zeros((3, 3), f)
            # --- link (k-1 -> k), neighbor k-1 fixed --------------------
            # rotation: r = Log(dR^T R_prev^T R), dr/dδθ ≈ R^T (left pert)
            rR_p = so3.log(dR_p.T @ r_p.T @ rot)
            J_rp = jnp.concatenate([rot.T, Z], axis=1)  # (3, 6)
            # position: r = R_prev^T (p - p_prev - v_prev dt - ½ g dt²) - dp
            u_p = pos - p_p - v_p * dt_p - 0.5 * grav * dt_p * dt_p
            rp_p = r_p.T @ u_p - dp_p
            J_pp = jnp.concatenate([Z, r_p.T], axis=1)
            # --- link (k -> k+1), neighbor k+1 fixed --------------------
            # rotation: r = Log(dR^T R^T R_next), dr/dδθ ≈ -R_next^T
            rR_n = so3.log(dR_n.T @ rot.T @ r_n)
            J_rn = jnp.concatenate([-r_n.T, Z], axis=1)
            # position: r = R^T (p_next - p - v_k dt - ½ g dt²) - dp
            u_n = p_n - pos - v_k * dt_n - 0.5 * grav * dt_n * dt_n
            rp_n = rot.T @ u_n - dp_n
            J_pn = jnp.concatenate([rot.T @ so3.skew(u_n), -rot.T], axis=1)
            for J, r_, wgt in ((J_rp, rR_p, w_rot * okp),
                               (J_pp, rp_p, w_pos * okp),
                               (J_rn, rR_n, w_rot * okn),
                               (J_pn, rp_n, w_pos * okn)):
                HtH = HtH + wgt * J.T @ J
                Htz = Htz - wgt * J.T @ r_

        if photo is not None:
            cam, Rci, Pci, ps, w_photo = photo_ctx
            HtH_p, Htz_p = _photo_terms(rot, pos, photo, cam, Rci, Pci,
                                        ps, w_photo)
            HtH = HtH + HtH_p.astype(HtH.dtype)
            Htz = Htz + Htz_p.astype(Htz.dtype)

        sol = jnp.linalg.solve(HtH, Htz)
        rot = so3.exp(sol[0:3]) @ rot  # left perturbation (world frame)
        pos = pos + sol[3:6]
        return (rot, pos), jnp.sum(use)

    (rot, pos), n_used = jax.lax.scan(gn, (rot, pos), None, length=iters)
    return rot, pos, n_used[-1]


def refine_window(window: Window, map_cfg: vm.VoxelMapConfig,
                  outer_iters: int = 2, gn_iters: int = 3,
                  dept_err: float = 0.02, beam_err: float = 0.05,
                  mesh=None, imu_links: "ImuLinks" = None,
                  imu_rot_sigma: float = 0.01, imu_pos_sigma: float = 0.05,
                  link_sweeps: int = 4,
                  photo: "PhotoFactors" = None, cam=None,
                  Rci=None, Pci=None, patch_size: int = 8,
                  photo_weight: float = 0.01):
    """Alternate map rebuild / pose refinement. Returns (window, n_used
    (K,)). Shard `window` arrays on the leading K axis over a mesh for
    multi-device execution (see tests/test_ba.py).

    imu_links: optional preintegrated IMU factors between consecutive
    keyframes (ImuLinks). Each keyframe's GN then also anchors to its
    two neighbors' poses (held fixed per outer iteration — Jacobi), so
    the window stays observable where the map is degenerate.
    imu_rot_sigma / imu_pos_sigma: 1σ of a link's rotation (rad) and
    position (m) residual at dt=1 s; weights scale as 1/(σ²·dt).
    link_sweeps: Jacobi sweeps per map rebuild — information propagates
    one keyframe hop per sweep along the chain, so sweeps*outer_iters
    bounds the effective constraint propagation distance.

    photo: optional PhotoFactors — per-keyframe photometric pose factors
    (vio.cpp:1520-1688's measurement model; needs cam/Rci/Pci).
    photo_weight: per-pixel information weight; the VIO convention is
    1/img_point_cov (default 1/100)."""
    K, N, _ = window.scans.shape
    photo_ctx = (cam, Rci, Pci, patch_size, photo_weight) \
        if photo is not None else None

    n_used = jnp.zeros((K,), jnp.int32)
    for _ in range(outer_iters):
        pts_w = _world_points(window).reshape(K * N, 3)
        body6 = vm.sym6(
            calc_body_cov(window.scans.reshape(K * N, 3), dept_err, beam_err)
        )
        m = vm.make_map(map_cfg)
        m = vm.update_map(m, pts_w, body6, window.valid.reshape(K * N),
                          map_cfg, mesh=mesh)

        if imu_links is None:
            if photo is None:
                rot, pos, n_used = jax.vmap(
                    lambda r, p, s, v: _refine_pose_one(
                        r, p, s, v, m, map_cfg, gn_iters, dept_err, beam_err
                    )
                )(window.rot, window.pos, window.scans, window.valid)
            else:
                rot, pos, n_used = jax.vmap(
                    lambda r, p, s, v, ph: _refine_pose_one(
                        r, p, s, v, m, map_cfg, gn_iters, dept_err,
                        beam_err, photo=ph, photo_ctx=photo_ctx)
                )(window.rot, window.pos, window.scans, window.valid,
                  tuple(photo))
        else:
            L = imu_links
            dt_s = jnp.maximum(L.dt, 1e-3)
            w_rot_k = 1.0 / (imu_rot_sigma**2 * dt_s)  # (K,) link k->k+1
            w_pos_k = 1.0 / (imu_pos_sigma**2 * dt_s)
            w_prev_rot = jnp.roll(w_rot_k, 1)
            w_prev_pos = jnp.roll(w_pos_k, 1)
            idx = jnp.arange(K)

            def one(r, p, s, v, rp, pp, dRp, dpp, dtp, vp, okp,
                    rn, pn, dRn, dpn, dtn, vk, okn, wr_p, wp_p, wr_n, wp_n,
                    ph=None):
                # per-edge weights: prev edge uses link k-1's dt
                nbr = (rp, pp, dRp, dpp, dtp, vp, okp,
                       rn, pn, dRn, dpn, dtn, vk, okn,
                       L.grav,
                       jnp.where(okp, wr_p, wr_n),  # see note below
                       jnp.where(okp, wp_p, wp_n))
                return _refine_pose_one(r, p, s, v, m, map_cfg, gn_iters,
                                        dept_err, beam_err, nbr=nbr,
                                        photo=ph, photo_ctx=photo_ctx)

            # NOTE: _refine_pose_one applies ONE (w_rot, w_pos) pair to
            # both edges; the per-edge dt weighting difference is second
            # order (adjacent links have similar dt), so we pass the
            # prev-edge weight when it exists, else the next-edge one.
            rot, pos = window.rot, window.pos
            for _ in range(link_sweeps):
                # neighbor snapshots refresh each sweep (jnp.roll ->
                # collective permute under keyframe sharding)
                roll = lambda a, sh: jnp.roll(a, sh, axis=0)
                nbrs = (
                    roll(rot, 1), roll(pos, 1),  # prev pose
                    roll(L.dR, 1), roll(L.dp, 1), roll(dt_s, 1),
                    roll(L.vel, 1),
                    roll(L.valid, 1) & (idx > 0),  # link (k-1 -> k)
                    roll(rot, -1), roll(pos, -1),  # next pose
                    L.dR, L.dp, dt_s, L.vel,
                    L.valid & (idx < K - 1),  # link (k -> k+1)
                )
                if photo is None:
                    rot, pos, n_used = jax.vmap(one)(
                        rot, pos, window.scans, window.valid,
                        *nbrs, w_prev_rot, w_prev_pos, w_rot_k, w_pos_k)
                else:
                    rot, pos, n_used = jax.vmap(one)(
                        rot, pos, window.scans, window.valid,
                        *nbrs, w_prev_rot, w_prev_pos, w_rot_k, w_pos_k,
                        tuple(photo))
        rot = so3.normalize_rotation(rot)
        window = window._replace(rot=rot, pos=pos)
    return window, n_used


def _is_ready(arr) -> bool:
    """True when a device array's computation has completed (async
    dispatch future). Falls back to True where the runtime lacks
    is_ready (then the consumer's np.asarray blocks, which is still
    correct, just synchronous)."""
    try:
        return arr.is_ready()
    except AttributeError:
        return True


class OnlineRefiner:
    """Sliding-window refinement running BEHIND the causal front-end
    (SURVEY §2.3 north star; the reference has no backend at all).

    submit() dispatches the whole refine_window program chain
    asynchronously — the device executes it in the idle gaps between
    frame programs (single chip) or on its own mesh devices (sharded), and
    the host never blocks on it. poll() hands back the refined poses
    only once the device has actually finished them, so the front-end's
    frame cadence is never stalled by the backend. The pipeline consumes
    results double-buffered: refine window k while the filter runs
    frames of window k+1, then feed the newest keyframe's pose delta
    back (LIVOPipeline._consume_refine)."""

    def __init__(self, map_cfg: vm.VoxelMapConfig, outer_iters: int = 2,
                 gn_iters: int = 2, dept_err: float = 0.02,
                 beam_err: float = 0.05, mesh=None,
                 cam=None, Rci=None, Pci=None, patch_size: int = 8,
                 photo_weight: float = 0.01):
        self.map_cfg = map_cfg
        self.outer_iters = outer_iters
        self.gn_iters = gn_iters
        self.dept_err = dept_err
        self.beam_err = beam_err
        self.mesh = mesh
        self._pending: Optional[Tuple] = None  # (meta, refined Window)
        # ONE dispatch per submit: eager refine_window would issue its
        # whole GN chain op-by-op on the submitting frame's host thread
        # (~1 ms per dispatch on the remote relay — the opposite of
        # "never stalls the front-end").
        self._refine_jit = jax.jit(lambda w: refine_window(
            w, map_cfg, outer_iters=outer_iters, gn_iters=gn_iters,
            dept_err=dept_err, beam_err=beam_err, mesh=mesh))
        self._refine_linked_jit = jax.jit(lambda w, l: refine_window(
            w, map_cfg, outer_iters=outer_iters, gn_iters=gn_iters,
            dept_err=dept_err, beam_err=beam_err, mesh=mesh, imu_links=l))
        # photometric variants (VERDICT r4 item 4) — built only when the
        # camera context is provided
        if cam is not None:
            pk = dict(photo_weight=photo_weight, patch_size=patch_size,
                      cam=cam, Rci=Rci, Pci=Pci)
            self._refine_photo_jit = jax.jit(lambda w, ph: refine_window(
                w, map_cfg, outer_iters=outer_iters, gn_iters=gn_iters,
                dept_err=dept_err, beam_err=beam_err, mesh=mesh,
                photo=ph, **pk))
            self._refine_linked_photo_jit = jax.jit(
                lambda w, l, ph: refine_window(
                    w, map_cfg, outer_iters=outer_iters, gn_iters=gn_iters,
                    dept_err=dept_err, beam_err=beam_err, mesh=mesh,
                    imu_links=l, photo=ph, **pk))

    @property
    def busy(self) -> bool:
        return self._pending is not None

    def submit(self, window: Window, meta=None, links=None,
               photo=None) -> bool:
        """Dispatch one window refinement (non-blocking). Returns False
        while a previous refinement is pending — in flight OR completed
        but not yet poll()ed (overwriting a completed result would lose
        it; poll first). Dropped submissions are fine: the next stride
        covers these keyframes too. `links`: optional ImuLinks; `photo`:
        optional PhotoFactors (needs the camera context at __init__)."""
        if self._pending is not None:
            return False
        if photo is not None and links is not None:
            refined, _ = self._refine_linked_photo_jit(window, links, photo)
        elif photo is not None:
            refined, _ = self._refine_photo_jit(window, photo)
        elif links is not None:
            refined, _ = self._refine_linked_jit(window, links)
        else:
            refined, _ = self._refine_jit(window)
        self._pending = (meta, refined)
        return True

    def poll(self, force: bool = False):
        """(meta, rot (K,3,3) np, pos (K,3) np) once the refinement has
        completed on device; None while still running (or idle).
        force=True blocks for the result (end of stream)."""
        if self._pending is None:
            return None
        meta, refined = self._pending
        if not force and not _is_ready(refined.pos):
            return None
        self._pending = None
        return meta, np.asarray(refined.rot), np.asarray(refined.pos)
