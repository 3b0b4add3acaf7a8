"""Sparse-direct visual-inertial odometry as fixed-shape batched ops.

TPU-native re-design of VIOManager (reference src/vio.cpp, include/vio.h):

- The visual sparse map (`unordered_map<VOXEL_LOCATION, VOXEL_POINTS*>` of
  heap VisualPoints with Feature lists, vio.cpp:227-250) becomes a
  fixed-capacity structure-of-arrays pool: P point slots x K observation
  slots, plus a ring buffer of the last F grayscale frames that
  observations reference for warping. Ring eviction invalidates the
  observations sourced from the evicted frame (the reference instead keeps
  every reference image alive via cv::Mat refcounts — the ring bounds
  memory; K and F are config).
- Pool storage is PACKED into three arrays (`point (P, 19)`,
  `obs (P, K, 20)`, `obs_patch (P, K, ps²)`): on remote-TPU links the
  dispatch cost of a chained jit call scales with pytree leaf count
  (~1 ms/leaf), so per-frame state must be few fat arrays. Every scatter
  writes full trailing rows (column-slice scatters copy their operand).
- Per-frame visible-point retrieval (retrieveFromVisualSparseMap,
  vio.cpp:352-782) becomes: project *all* pool points, pick the nearest
  per image grid cell by scatter-min, depth-continuity-check against a
  scatter-min rasterized depth map, select the reference patch, warp it by
  the plane-normal homography, and outlier-gate — all batched over the
  fixed grid-cell count. Projection-based retrieval subsumes the
  reference's scan-voxel iteration + FOV checks.
- The coarse-to-fine iterated photometric ESIKF (updateState,
  vio.cpp:1520-1688) runs per pyramid level as a lax.while_loop with the
  reference's error-rollback/convergence exits; each iteration is one
  fused superpatch sample + Jacobian chain + 7x7 normal-equation pass.
- Map maintenance (generateVisualMapPoints :804-906, updateVisualMapPoints
  :908-967, updateReferencePatch :969-1100) becomes grid-scatter argmax
  for new points, masked observation appends with min-score eviction, and
  batched NCC re-scoring + normal refinement from the LIO plane map.
- Raycast recovery for LiDAR-blind cells (vio.cpp:80-126, :487-591) in
  raycast_recover below.

- The inverse-compositional variant (updateStateInverse, vio.cpp
  :1327-1518; default-off in the bundled configs, as in the reference)
  is `photometric_update_ic` below: reference-frame gradients and
  6-DoF Jacobians precomputed once per frame, fixed Hᵀ H across
  iterations.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models import camera as cam_mod
from ..ops import image as img_ops
from ..ops import pallas_photo

_PALLAS_ON_CPU = False  # test override: run the fused photometric
# kernel interpreted on CPU (tests/test_pallas_photo.py)
from ..ops import so3
from ..ops.precision import hi_precision
from .state import DIM_STATE, NavState, boxminus, boxplus
from .voxel_map import VoxelMap, VoxelMapConfig, query_plane, sym6

# point row layout (P, 19)
_P_POS = slice(0, 3)
_P_NRM = slice(3, 6)
_P_PRV = slice(6, 9)
_P_COV = slice(9, 15)  # sym6 world covariance at creation
_P_VALID = 15
_P_CONV = 16
_P_HASREF = 17
_P_REF = 18
POINT_W = 19

# obs row layout (P, K, 20)
_O_VALID = 0
_O_PX = slice(1, 3)
_O_R = slice(3, 12)  # row-major camera-from-world rotation
_O_T = slice(12, 15)
_O_EXPO = 15
_O_SLOT = 16
_O_FID = 17
_O_MEAN = 18
_O_SCORE = 19
OBS_W = 20


class VIOConfig(NamedTuple):
    """Static VIO configuration (compile-time)."""

    # camera grid
    grid_size: int = 30  # px per cell (derived: height / grid_n_height)
    grid_n_width: int = 22
    grid_n_height: int = 18
    # patches
    patch_size: int = 8
    pyramid_levels: int = 3  # patch_pyrimid_level
    max_obs: int = 8  # observation slots per point (reference caps 30)
    pool_capacity: int = 65536
    frame_ring: int = 64
    # filter
    max_iterations: int = 5
    img_point_cov: float = 100.0
    outlier_threshold: float = 1000.0
    exposure_estimate_en: bool = True
    normal_en: bool = True  # vio.cpp:653-742: True = min-photometric-error
    # ref selection + plane-normal homography warp; False = closest-view
    # ref selection (getCloseViewObs) + fronto-parallel depth warp
    # (getWarpMatrixAffine)
    ncc_en: bool = False
    ncc_thre: float = 0.0
    raycast_en: bool = False
    inverse_composition_en: bool = False
    true_pyramid: bool = False  # sample anti-aliased box-average levels
    # (ops/image.box_stack) instead of the reference's raw strided
    # level-0 taps in the photometric update. A/B'd under sensor-
    # realistic noise in tests/test_pyramid_ab.py.
    pallas_photo: bool = False  # one fused Pallas kernel per photometric
    # iteration (ops/pallas_photo); pinhole + raw-strided sampling only.
    # map maintenance
    select_obs_gap_p: float = 0.5  # delta_p threshold (:939)
    select_obs_gap_theta: float = 0.3
    select_obs_gap_px: float = 40.0


def n_cells(cfg: VIOConfig) -> int:
    return cfg.grid_n_width * cfg.grid_n_height


def derive_grid(cam: cam_mod.Camera, grid_size: int, grid_n_height: int):
    """Reference grid geometry (initializeVIO, vio.cpp:67-78)."""
    if grid_size > 10:
        gs = grid_size
    else:
        gs = cam.height // grid_n_height
    gnw = -(-cam.width // gs)
    gnh = -(-cam.height // gs)
    return gs, gnw, gnh


def border_px(cfg: VIOConfig) -> int:
    # (patch_size_half + 1) << pyramid_levels (vio.cpp:154)
    return (cfg.patch_size // 2 + 1) * (1 << cfg.pyramid_levels)


class VisualPool(NamedTuple):
    point: jnp.ndarray  # (P, 19) packed point rows
    obs: jnp.ndarray  # (P, K, 20) packed observation rows
    obs_patch: jnp.ndarray  # (P, K, ps²) level-0 patch at capture
    alloc: jnp.ndarray  # () float allocation cursor (wraps)


class FrameRing(NamedTuple):
    imgs: jnp.ndarray  # (F, H, W) float32 grayscale
    ids: jnp.ndarray  # (F,) int32 global frame id, -1 empty


def make_pool(cfg: VIOConfig) -> VisualPool:
    P, K, ps2 = cfg.pool_capacity, cfg.max_obs, cfg.patch_size**2
    return VisualPool(
        point=jnp.zeros((P, POINT_W), jnp.float32),
        obs=jnp.zeros((P, K, OBS_W), jnp.float32),
        obs_patch=jnp.zeros((P, K, ps2), jnp.float32),
        alloc=jnp.asarray(0.0, jnp.float32),
    )


def make_ring(cfg: VIOConfig, cam: cam_mod.Camera) -> FrameRing:
    return FrameRing(
        imgs=jnp.zeros((cfg.frame_ring, cam.height, cam.width), jnp.float32),
        ids=jnp.full((cfg.frame_ring,), -1, jnp.int32),
    )


# ---- accessors for tests/tools ----

def pool_point_valid(pool: VisualPool):
    return pool.point[:, _P_VALID] > 0.5


def pool_obs_valid(pool: VisualPool):
    return pool.obs[:, :, _O_VALID] > 0.5


def pool_pos(pool: VisualPool):
    return pool.point[:, _P_POS]


def pool_converged(pool: VisualPool):
    return pool.point[:, _P_CONV] > 0.5


def camera_pose(state: NavState, Rci, Pci):
    """IMU state -> camera-from-world pose (updateFrameState,
    vio.cpp:1690-1697)."""
    Rcw = Rci @ state.rot.T
    Pcw = -Rcw @ state.pos + Pci
    return Rcw, Pcw


def _cell_argbest(cell: jnp.ndarray, key: jnp.ndarray, valid: jnp.ndarray,
                  num_cells: int, mode: str):
    """Per-cell argmin/argmax via scatter + tie-break on max lane index.
    Returns (num_cells,) winning lane index or -1."""
    big = jnp.float32(3e38)
    k = jnp.where(valid, key, big if mode == "min" else -big)
    tgt = jnp.where(valid, cell, num_cells)
    if mode == "min":
        best = jnp.full((num_cells,), big).at[tgt].min(k, mode="drop")
        is_best = valid & (k <= best[cell])
    else:
        best = jnp.full((num_cells,), -big).at[tgt].max(k, mode="drop")
        is_best = valid & (k >= best[cell])
    lane = jnp.arange(cell.shape[0], dtype=jnp.int32)
    idx = jnp.where(is_best, lane, -1)
    return jnp.full((num_cells,), -1, jnp.int32).at[tgt].max(idx, mode="drop")


class Submap(NamedTuple):
    """Per-frame tracked visual submap (SubSparseMap, vio.h:50-77),
    padded to the grid cell count."""

    valid: jnp.ndarray  # (M,)
    point_idx: jnp.ndarray  # (M,) pool index
    pos: jnp.ndarray  # (M, 3)
    search_level: jnp.ndarray  # (M,) int32
    warp_patch: jnp.ndarray  # (M, L, patch²) warped reference patches
    ref_expo: jnp.ndarray  # (M,)
    propa_error: jnp.ndarray  # (M,) pre-update photometric error
    ref_meta: jnp.ndarray  # (M, 15) [px(2) | R_cw(9) | t(3) | ring slot]
    # Pool rows gathered once during retrieval and threaded through to the
    # maintenance stage (random-access ops are latency-bound; re-gathering
    # the same rows there would cost ~2 ms/frame). point_rows carries the
    # retrieval's ref-slot cache updates. None for submaps built outside
    # retrieve() that never reach the maintenance stage.
    point_rows: jnp.ndarray = None  # (M, 19)
    obs_rows: jnp.ndarray = None  # (M, K, 20)
    patch_rows: jnp.ndarray = None  # (M, K, ps²)


def rasterize_depth(cam: cam_mod.Camera, Rcw, Pcw, pg_w, pg_valid, border):
    """Scatter-min depth image from the current scan (reference writes
    last-wins at vio.cpp:386-428; min is strictly better for occlusion)."""
    pc = pg_w @ Rcw.T + Pcw
    px = cam_mod.world2cam(cam, pc)
    ok = pg_valid & (pc[:, 2] > 0) & cam_mod.in_frame(cam, px, border)
    col = jnp.clip(px[:, 0].astype(jnp.int32), 0, cam.width - 1)
    row = jnp.clip(px[:, 1].astype(jnp.int32), 0, cam.height - 1)
    flat = jnp.where(ok, row * cam.width + col, cam.height * cam.width)
    big = jnp.float32(3e38)
    depth = jnp.full((cam.height * cam.width,), big).at[flat].min(
        jnp.where(ok, pc[:, 2], big), mode="drop"
    )
    depth = jnp.where(depth >= big, 0.0, depth)
    return depth.reshape(cam.height, cam.width)


def _warp_homography(cam, ring, sel_obs, sel_point, Rcw, Pcw, cfg: VIOConfig):
    """Reference-patch affine warp via plane-normal homography
    (getWarpMatrixAffineHomography + getBestSearchLevel + warpAffine,
    vio.cpp:252-331). sel_obs: (M, 20) packed ref-observation rows;
    sel_point: (M, 19) packed point rows. Returns (search_level (M,),
    warp (M, L, patch²), ok (M,))."""
    ps = cfg.patch_size
    M = sel_obs.shape[0]
    R_ref = sel_obs[:, _O_R].reshape(M, 3, 3)
    t_ref = sel_obs[:, _O_T]
    px_ref = sel_obs[:, _O_PX]
    pos = sel_point[:, _P_POS]
    normal = sel_point[:, _P_NRM]

    pf = jnp.einsum("mij,mj->mi", R_ref, pos) + t_ref  # point in ref cam
    norm_ref = jnp.einsum("mij,mj->mi", R_ref, normal)
    norm_ref = norm_ref / jnp.maximum(
        jnp.linalg.norm(norm_ref, axis=-1, keepdims=True), 1e-9
    )

    # T_cur_ref = T_cur_w ∘ T_w_ref
    R_cr = Rcw @ jnp.swapaxes(R_ref, -1, -2)  # (M, 3, 3)
    t_cr = Pcw - jnp.einsum("mij,mj->mi", R_cr, t_ref)
    # t of T_cur_ref.inverse() = -R_cr^T t_cr (cur cam origin in ref frame)
    t_inv = -jnp.einsum("mji,mj->mi", R_cr, t_cr)
    nd = jnp.sum(norm_ref * pf, axis=-1)  # n·x
    H = R_cr @ (
        nd[:, None, None] * jnp.eye(3) - t_inv[:, :, None] * norm_ref[:, None, :]
    )

    f_du = cam_mod.cam2world(cam, px_ref + jnp.asarray([4.0, 0.0]))
    f_dv = cam_mod.cam2world(cam, px_ref + jnp.asarray([0.0, 4.0]))
    f_c = jnp.einsum("mij,mj->mi", H, cam_mod.cam2world(cam, px_ref))
    f_duc = jnp.einsum("mij,mj->mi", H, f_du)
    f_dvc = jnp.einsum("mij,mj->mi", H, f_dv)
    px_c = cam_mod.world2cam(cam, f_c)
    A = jnp.stack(
        [
            (cam_mod.world2cam(cam, f_duc) - px_c) / 4.0,
            (cam_mod.world2cam(cam, f_dvc) - px_c) / 4.0,
        ],
        axis=-1,
    )  # (M, 2, 2) columns [du, dv]

    # Best search level: halve (det/4) while det > 3, max level 2 (:320-331)
    D = A[:, 0, 0] * A[:, 1, 1] - A[:, 0, 1] * A[:, 1, 0]
    search = jnp.zeros(M, jnp.int32)
    Dw = D
    for _ in range(2):
        step = Dw > 3.0
        search = search + step.astype(jnp.int32)
        Dw = jnp.where(step, Dw * 0.25, Dw)

    ok = jnp.abs(D) > 1e-8
    det_safe = jnp.where(ok, D, 1.0)
    Ainv = (
        jnp.stack(
            [
                jnp.stack([A[:, 1, 1], -A[:, 0, 1]], axis=-1),
                jnp.stack([-A[:, 1, 0], A[:, 0, 0]], axis=-1),
            ],
            axis=-2,
        )
        / det_safe[:, None, None]
    )

    dx, dy = img_ops.patch_offsets(ps)  # (ps²,) column/row offsets
    offs = jnp.stack([dx, dy], axis=-1).astype(jnp.float32)  # (ps², 2)
    slot = sel_obs[:, _O_SLOT].astype(jnp.int32)
    fid = sel_obs[:, _O_FID].astype(jnp.int32)
    ref_ok = ok & (slot >= 0) & (ring.ids[jnp.clip(slot, 0, None)] == fid)
    slot_c = jnp.clip(slot, 0, cfg.frame_ring - 1)

    h_img, w_img = ring.imgs.shape[1], ring.imgs.shape[2]
    # All pyramid levels in one gather set.
    lvl_sc = jnp.asarray([1 << l for l in range(cfg.pyramid_levels)], jnp.float32)
    sc = lvl_sc[None, :, None, None] * (2.0 ** search.astype(jnp.float32))[:, None, None, None]
    px_patch = offs[None, None, :, :] * sc  # (M, L, ps², 2)
    samp = jnp.einsum("mij,mlpj->mlpi", Ainv, px_patch) + px_ref[:, None, None, :]
    u, vv = samp[..., 0], samp[..., 1]
    inb = (u >= 0) & (vv >= 0) & (u < w_img - 1) & (vv < h_img - 1)
    x0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, w_img - 2)
    y0 = jnp.clip(jnp.floor(vv).astype(jnp.int32), 0, h_img - 2)
    su = u - x0
    sv = vv - y0
    # All four bilinear taps as ONE flat scalar gather: a (M, L, ps², 4)
    # index tensor into the flattened ring. XLA lowers flat scalar gathers
    # ~5x faster than the equivalent multi-dim (slot, y+oy, x+ox) block
    # gather on this chip (5.9 -> 1.25 ms at 396x3x64 samples).
    base = slot_c[:, None, None] * (h_img * w_img) + y0 * w_img + x0
    taps = jnp.stack([base, base + 1, base + w_img, base + w_img + 1], axis=-1)
    blk = ring.imgs.reshape(-1)[taps]  # (M, L, ps², 4) = [tl, tr, bl, br]
    val = (
        (1 - su) * (1 - sv) * blk[..., 0]
        + su * (1 - sv) * blk[..., 1]
        + (1 - su) * sv * blk[..., 2]
        + su * sv * blk[..., 3]
    )
    warp = jnp.where(inb, val, 0.0)  # (M, L, ps²)
    return search, warp, ref_ok


def retrieve(pool: VisualPool, ring: FrameRing, img, depth_img, state: NavState,
             cam: cam_mod.Camera, Rci, Pci, cfg: VIOConfig):
    """Build the tracked submap for this frame (retrieveFromVisualSparseMap,
    vio.cpp:352-782). Returns (submap, pool)."""
    ps = cfg.patch_size
    M = n_cells(cfg)
    P = cfg.pool_capacity
    Rcw, Pcw = camera_pose(state, Rci, Pci)
    cam_pos = -Rcw.T @ Pcw

    pos_all = pool.point[:, _P_POS]
    pc = pos_all @ Rcw.T + Pcw
    px = cam_mod.world2cam(cam, pc)
    # _P_VALID already implies >=1 live observation: ring_insert (always
    # run before retrieval) kills points whose last observation died, so
    # no full-pool obs scan is needed here.
    cand = (
        (pool.point[:, _P_VALID] > 0.5)
        & (pc[:, 2] > 0)
        & cam_mod.in_frame(cam, px, border_px(cfg))
    )
    cell = (
        jnp.clip(px[:, 1].astype(jnp.int32) // cfg.grid_size, 0, cfg.grid_n_height - 1)
        * cfg.grid_n_width
        + jnp.clip(px[:, 0].astype(jnp.int32) // cfg.grid_size, 0, cfg.grid_n_width - 1)
    )
    dist = jnp.linalg.norm(pos_all - cam_pos, axis=-1)
    win = _cell_argbest(cell, dist, cand, M, "min")  # (M,) pool idx or -1

    sel = win >= 0
    pidx = jnp.where(sel, win, 0)
    sel_point = pool.point[pidx]  # (M, 19) — one gather
    sel_obs_rows = pool.obs[pidx]  # (M, K, 20) — one gather
    sel_patches = pool.obs_patch[pidx]  # (M, K, ps²)
    # Recompute the selected projections from the gathered rows instead of
    # gathering px/pc (M-row random reads cost ~1 ms each on this link;
    # the reprojection is register math).
    sel_pc = sel_point[:, _P_POS] @ Rcw.T + Pcw
    sel_px = cam_mod.world2cam(cam, sel_pc)

    # Depth continuity (vio.cpp:619-640).
    dxo, dyo = img_ops.patch_offsets(ps + 1)  # ±half inclusive → 9x9
    cx = jnp.clip(sel_px[:, 0].astype(jnp.int32)[:, None] + dxo[None, :], 0, cam.width - 1)
    cy = jnp.clip(sel_px[:, 1].astype(jnp.int32)[:, None] + dyo[None, :], 0, cam.height - 1)
    dpatch = depth_img[cy, cx]
    bad_depth = jnp.any(
        (dpatch > 0) & (jnp.abs(sel_pc[:, 2:3] - dpatch) > 0.5), axis=1
    )
    sel = sel & ~bad_depth

    K = cfg.max_obs
    obs_valid = sel_obs_rows[:, :, _O_VALID] > 0.5  # (M, K)
    if cfg.normal_en:
        # --- Reference patch selection (normal_en path, vio.cpp:653-693):
        # the observation with minimum mean photometric error vs the
        # others, cached per point across frames. ---
        n_obs_sel = jnp.sum(obs_valid, axis=1)
        diff = sel_patches[:, :, None, :] - sel_patches[:, None, :, :]
        perr = jnp.sum(diff * diff, axis=-1)  # (M, K, K)
        pair_ok = obs_valid[:, :, None] & obs_valid[:, None, :] & ~jnp.eye(K, dtype=bool)
        cnt = jnp.maximum(jnp.sum(pair_ok, axis=-1), 1)
        mean_err = jnp.where(
            obs_valid, jnp.sum(jnp.where(pair_ok, perr, 0.0), axis=-1) / cnt, 3e38
        )
        best_obs = jnp.argmin(mean_err, axis=-1).astype(jnp.int32)
        first_obs = jnp.argmax(obs_valid, axis=-1).astype(jnp.int32)
        had_ref = sel_point[:, _P_HASREF] > 0.5
        prev_ref = sel_point[:, _P_REF].astype(jnp.int32)
        ref_valid_still = jnp.take_along_axis(obs_valid, prev_ref[:, None], axis=1)[:, 0]
        ref_slot = jnp.where(
            had_ref & ref_valid_still,
            prev_ref,
            jnp.where(n_obs_sel == 1, first_obs, best_obs),
        )
        # Chosen refs (pt->ref_patch caching, :689-692) ride the threaded
        # point_rows to the maintenance stage's single scatter instead of a
        # dedicated write here (lanes gated out later simply re-select their
        # ref next frame).
        new_point_rows = sel_point.at[:, _P_REF].set(ref_slot.astype(jnp.float32))
        new_point_rows = new_point_rows.at[:, _P_HASREF].set(1.0)
    else:
        # --- normal_en=false path: closest-view observation
        # (VisualPoint::getCloseViewObs, visual_point.cpp:57-95): maximize
        # the cosine between the current and observation view directions;
        # drop the point past 60°. No ref caching (the reference re-picks
        # every frame in this branch). ---
        obs_R = sel_obs_rows[:, :, _O_R].reshape(M, K, 3, 3)
        obs_t = sel_obs_rows[:, :, _O_T]  # world->cam translation
        obs_cam_pos = -jnp.einsum("mkji,mkj->mki", obs_R, obs_t)
        cur_dir = cam_pos[None, :] - sel_point[:, _P_POS]
        cur_dir = cur_dir / jnp.maximum(
            jnp.linalg.norm(cur_dir, axis=-1, keepdims=True), 1e-9)
        obs_dir = obs_cam_pos - sel_point[:, None, _P_POS]
        obs_dir = obs_dir / jnp.maximum(
            jnp.linalg.norm(obs_dir, axis=-1, keepdims=True), 1e-9)
        cos_a = jnp.where(obs_valid,
                          jnp.sum(obs_dir * cur_dir[:, None, :], axis=-1),
                          -2.0)
        ref_slot = jnp.argmax(cos_a, axis=-1).astype(jnp.int32)
        sel = sel & (jnp.max(cos_a, axis=-1) >= 0.5)
        new_point_rows = sel_point

    sel_ref_obs = jnp.take_along_axis(
        sel_obs_rows, ref_slot[:, None, None], axis=1
    )[:, 0, :]  # (M, 20)
    if cfg.normal_en:
        warp_rows = new_point_rows
    else:
        # Fronto-parallel warp (getWarpMatrixAffine, vio.cpp:276-292):
        # the homography with the plane normal set to the ref camera's
        # optical axis (n_ref = e_z => n·x = depth) reproduces the
        # constant-depth back-projection exactly (world2cam quotients the
        # per-point positive scale).
        R_ref_sel = sel_ref_obs[:, _O_R].reshape(M, 3, 3)
        warp_rows = new_point_rows.at[:, _P_NRM].set(R_ref_sel[:, 2, :])
    search, warp, warp_ok = _warp_homography(
        cam, ring, sel_ref_obs, warp_rows, Rcw, Pcw, cfg
    )
    sel = sel & warp_ok

    # Outlier gate on exposure-normalized level-0 error (:744-763)
    cur_patch = img_ops.sample_patches(img, sel_px, jnp.ones(M, jnp.int32), ps)
    ref_expo = sel_ref_obs[:, _O_EXPO]
    e = ref_expo[:, None] * warp[:, 0, :] - state.inv_expo * cur_patch
    err0 = jnp.sum(e * e, axis=-1)
    sel = sel & (err0 <= cfg.outlier_threshold * ps * ps)
    if cfg.ncc_en:
        a = warp[:, 0, :] - jnp.mean(warp[:, 0, :], axis=-1, keepdims=True)
        b = cur_patch - jnp.mean(cur_patch, axis=-1, keepdims=True)
        ncc = jnp.sum(a * b, axis=-1) / jnp.sqrt(
            jnp.sum(a * a, axis=-1) * jnp.sum(b * b, axis=-1) + 1e-10
        )
        sel = sel & (ncc >= cfg.ncc_thre)

    ref_meta = jnp.concatenate(
        [sel_ref_obs[:, _O_PX], sel_ref_obs[:, _O_R], sel_ref_obs[:, _O_T],
         sel_ref_obs[:, _O_SLOT:_O_SLOT + 1]], axis=-1,
    )
    submap = Submap(
        valid=sel,
        point_idx=pidx,
        pos=sel_point[:, _P_POS],
        search_level=search,
        warp_patch=warp,
        ref_expo=ref_expo,
        propa_error=err0,
        ref_meta=ref_meta,
        point_rows=new_point_rows,
        obs_rows=sel_obs_rows,
        patch_rows=sel_patches,
    )
    return submap, pool


@hi_precision
def photometric_update(state_prop: NavState, cov_prop, submap: Submap, img,
                       cam: cam_mod.Camera, Rci, Pci, cfg: VIOConfig):
    """Coarse-to-fine iterated photometric ESIKF
    (computeJacobianAndUpdateEKF + updateState, vio.cpp:784-802,
    :1520-1688). Returns (state, cov, mean_error)."""
    f32 = cov_prop.dtype
    ps = cfg.patch_size
    expo_col = 1.0 if cfg.exposure_estimate_en else 0.0

    Pic = -Rci.T @ Pci
    Jdphi_dR = Rci
    Jdp_dR = -Rci @ so3.skew(Pic)

    cov_sym = 0.5 * (cov_prop + cov_prop.T)
    P_scaled_inv = jnp.linalg.inv(cov_sym / cfg.img_point_cov)

    n_meas = jnp.maximum(jnp.sum(submap.valid) * ps * ps, 1).astype(f32)

    state = state_prop
    G_keep = jnp.zeros((DIM_STATE, DIM_STATE), f32)
    final_err = jnp.asarray(0.0, f32)

    if cfg.true_pyramid:
        # search_level <= 2, so levels up to pyramid_levels-1+2 are
        # reachable; one O(L*H*W) integral-image pass per frame.
        img_stack = img_ops.box_stack(img, cfg.pyramid_levels + 2)
    else:
        img_stack = None
    # The fused kernel only pays on real TPUs; on CPU hosts pallas
    # falls back to the (slow) interpreter, so the long CPU test runs
    # keep the XLA path. tests/test_pallas_photo.py flips the module
    # override to exercise the kernel end-to-end interpreted.
    # M-gate: the kernel's grid is one sequential program per point, so
    # it wins where the XLA chain is launch-bound (M <= ~384: measured
    # 2.39 -> 1.76 ms at avia's M=396) and loses where XLA's batched
    # gathers amortize (measured 1.27 vs 2.04 ms at dense's M=512).
    use_pallas = (cfg.pallas_photo and not cfg.true_pyramid
                  and cam.model == "pinhole" and ps == 8
                  and submap.pos.shape[0] <= 448
                  and (jax.default_backend() == "tpu" or _PALLAS_ON_CPU))

    for level in reversed(range(cfg.pyramid_levels)):
        scale = (1 << level) * (2 ** submap.search_level.astype(jnp.int32))
        eff_lvl = level + submap.search_level.astype(jnp.int32)
        inv_scale = 1.0 / scale.astype(f32)
        ref = submap.ref_expo[:, None] * submap.warp_patch[:, level, :]
        pts_pack_l = (pallas_photo.pack_points(
            submap.pos, ref, eff_lvl, submap.valid, ps)
            if use_pallas else None)  # (meta, ref_patch) pair

        def iter_body(carry, scale=scale, inv_scale=inv_scale, ref=ref,
                      eff_lvl=eff_lvl, pts_pack=pts_pack_l):
            it, state, old_state, last_error, stop, G_keep, final_err = carry
            Rcw, Pcw = camera_pose(state, Rci, Pci)
            Jdp_dt = Rcw  # Rci @ Rwi^T (:1544)
            tau = state.inv_expo
            if use_pallas:
                # One fused kernel: project + strided sample + Jacobian
                # chain + masked 7x7 reduction (ops/pallas_photo).
                par = pallas_photo.pack_params(
                    Rcw.astype(jnp.float32), Pcw.astype(jnp.float32),
                    tau.astype(jnp.float32),
                    Jdphi_dR.astype(jnp.float32),
                    Jdp_dR.astype(jnp.float32),
                    cam.fx, cam.fy, cam.cx, cam.cy,
                    jnp.asarray(cam.d, jnp.float32), expo_col,
                    1.0 if cam_mod.has_distortion(cam) else 0.0)
                HTH7, HTz7, err_sum, _ = pallas_photo.photo_iteration(
                    img.astype(jnp.float32), pts_pack[0], pts_pack[1],
                    par, ps)
                HTH7 = HTH7.astype(f32)
                HTz7 = HTz7.astype(f32)
                error = err_sum.astype(f32) / n_meas
            else:
                pf = submap.pos @ Rcw.T + Pcw
                px = cam_mod.world2cam(cam, pf)
                ok = submap.valid & (pf[:, 2] > 1e-6)
                if cfg.true_pyramid:
                    val, du, dv = img_ops.sample_patches_with_grad(
                        img_stack, px, scale, ps, img_idx=eff_lvl)
                else:
                    val, du, dv = img_ops.sample_patches_with_grad(
                        img, px, scale, ps)

                Jimg = jnp.stack([du, dv], axis=-1) * (tau * inv_scale[:, None])[..., None]
                Jdpi = cam_mod.projection_jacobian(cam, pf)  # (M, 2, 3)
                p_hat = so3.skew(pf)
                Jca = jnp.einsum("mpi,mij->mpj", Jimg, Jdpi)  # (M, ps², 3)
                Jdphi = jnp.einsum("mpi,mij->mpj", Jca, p_hat)
                JdR = jnp.einsum("mpi,ij->mpj", Jdphi, Jdphi_dR) + jnp.einsum(
                    "mpi,ij->mpj", -Jca, Jdp_dR
                )
                Jdt = jnp.einsum("mpi,ij->mpj", -Jca, Jdp_dt)
                res = tau * val - ref
                Hcol = (val * expo_col)[..., None]
                H = jnp.concatenate([JdR, Jdt, Hcol], axis=-1)  # (M, ps², 7)

                w = ok.astype(f32)[:, None]
                error = jnp.sum(w * res * res) / n_meas

                HTH7 = jnp.einsum("mpi,mpj,m->ij", H, H, ok.astype(f32))
                HTz7 = jnp.einsum("mpi,mp,m->i", H, res, ok.astype(f32))
            HTH = jnp.zeros((DIM_STATE, DIM_STATE), f32).at[0:7, 0:7].set(HTH7)
            K_1 = jnp.linalg.inv(HTH + P_scaled_inv)
            G = jnp.zeros((DIM_STATE, DIM_STATE), f32).at[:, 0:7].set(
                K_1[:, 0:7] @ HTH7
            )
            vec = boxminus(state_prop, state)
            sol = -K_1[:, 0:7] @ HTz7 + vec - G[:, 0:7] @ vec[0:7]

            # Accept/rollback rule (:1648-1681): on improvement save the
            # pre-update state and apply the solution; otherwise revert to
            # the saved state (undo the previous update) and stop. Masked
            # by the carried stop flag: under jax.vmap the while body
            # keeps running for already-converged batch elements.
            active = ~stop
            accept = active & (error <= last_error)
            new_state = boxplus(state, sol)
            old_state, state = (
                jax.tree.map(lambda old, cur: jnp.where(accept, cur, old),
                             old_state, state),
                jax.tree.map(lambda old, new: jnp.where(accept, new, old),
                             old_state, new_state),
            )
            rot_add = jnp.linalg.norm(sol[0:3])
            t_add = jnp.linalg.norm(sol[3:6])
            converged = (rot_add * 57.3 < 0.001) & (t_add * 100.0 < 0.001)
            G_keep = jnp.where(accept, G, G_keep)
            final_err = jnp.where(accept, error, final_err)
            last_error = jnp.where(accept, error, last_error)
            stop = stop | ~accept | converged
            return (it + 1, state, old_state, last_error, stop, G_keep, final_err)

        def iter_cond(carry):
            it, stop = carry[0], carry[4]
            return (~stop) & (it < cfg.max_iterations)

        init = (jnp.asarray(0, jnp.int32), state, state, jnp.asarray(3e38, f32),
                jnp.asarray(False), G_keep, final_err)
        (_, state, _, _, _, G_keep, final_err) = jax.lax.while_loop(
            iter_cond, iter_body, init
        )

    cov = cov_prop - G_keep @ cov_prop
    return state, cov, final_err


@hi_precision
def photometric_update_ic(state_prop: NavState, cov_prop, submap: Submap,
                          img, ring: FrameRing, cam: cam_mod.Camera, Rci, Pci,
                          cfg: VIOConfig):
    """Inverse-compositional variant of the photometric update
    (precomputeReferencePatches + updateStateInverse,
    vio.cpp:1327-1518): per-pixel Jacobians are precomputed once per
    pyramid level from the *reference* image's gradients, so each
    iteration only samples current-image values (no gradients) and
    composes the cached 6-dof Jacobian with the current rotation
    (:1470-1474). Like the reference, this path is 6-dof (no exposure
    column) and uses plain pyramid scales (no per-point search level)."""
    f32 = cov_prop.dtype
    ps = cfg.patch_size
    M = submap.valid.shape[0]

    cov_sym = 0.5 * (cov_prop + cov_prop.T)
    P_scaled_inv = jnp.linalg.inv(cov_sym / cfg.img_point_cov)
    n_meas = jnp.maximum(jnp.sum(submap.valid) * ps * ps, 1).astype(f32)

    ref_px = submap.ref_meta[:, 0:2]
    R_ref_w = submap.ref_meta[:, 2:11].reshape(M, 3, 3)
    t_ref = submap.ref_meta[:, 11:14]
    slot = jnp.clip(submap.ref_meta[:, 14].astype(jnp.int32), 0,
                    cfg.frame_ring - 1)
    # pf in the ref camera: f_ref * depth (:1350-1352)
    f_ref = cam_mod.cam2world(cam, ref_px)
    ref_cam_center = -jnp.einsum("mji,mj->mi", R_ref_w, t_ref)
    depth = jnp.linalg.norm(submap.pos - ref_cam_center, axis=-1)
    pf_ref = f_ref * (depth / jnp.maximum(f_ref[:, 2], 1e-6))[:, None]
    p_w_hat = so3.skew(submap.pos)

    state = state_prop
    G_keep = jnp.zeros((DIM_STATE, DIM_STATE), f32)
    final_err = jnp.asarray(0.0, f32)

    for level in reversed(range(cfg.pyramid_levels)):
        scale = jnp.full((M,), 1 << level, jnp.int32)  # (:1440)
        inv_scale = 1.0 / float(1 << level)
        ref = submap.warp_patch[:, level, :]

        # --- precompute reference Jacobians (:1341-1394) ---
        _, du_r, dv_r = img_ops.sample_patches_with_grad(
            ring.imgs, ref_px, scale, ps, img_idx=slot
        )
        Jimg_r = jnp.stack([du_r, dv_r], axis=-1) * inv_scale  # (M, ps², 2)
        Jdpi_r = cam_mod.projection_jacobian(cam, pf_ref)  # (M, 2, 3)
        JR = jnp.einsum("mpi,mij,mjk->mpk", Jimg_r, Jdpi_r, R_ref_w)
        JdR0 = jnp.einsum("mpi,mij->mpj", JR, p_w_hat)  # (M, ps², 3)
        Jdt0 = -JR

        def iter_body(carry, scale=scale, ref=ref, JdR0=JdR0, Jdt0=Jdt0):
            it, state, old_state, last_error, stop, G_keep, final_err = carry
            Rcw, Pcw = camera_pose(state, Rci, Pci)
            pf = submap.pos @ Rcw.T + Pcw
            px = cam_mod.world2cam(cam, pf)
            ok = submap.valid & (pf[:, 2] > 1e-6)
            val = img_ops.sample_patches(img, px, scale, ps)
            res = val - ref

            Rwi = state.rot
            Pwi_hat = so3.skew(state.pos)
            # JdR = J_dR Rwi + J_dt [Pwi]x Rwi ; Jdt = J_dt Rwi (:1472-1473)
            JdR = jnp.einsum("mpi,ij->mpj", JdR0, Rwi) + jnp.einsum(
                "mpi,ij,jk->mpk", Jdt0, Pwi_hat, Rwi
            )
            Jdt = jnp.einsum("mpi,ij->mpj", Jdt0, Rwi)
            H = jnp.concatenate([JdR, Jdt], axis=-1)  # (M, ps², 6)

            w = ok.astype(f32)[:, None]
            error = jnp.sum(w * res * res) / n_meas

            HTH6 = jnp.einsum("mpi,mpj,m->ij", H, H, ok.astype(f32))
            HTz6 = jnp.einsum("mpi,mp,m->i", H, res, ok.astype(f32))
            HTH = jnp.zeros((DIM_STATE, DIM_STATE), f32).at[0:6, 0:6].set(HTH6)
            K_1 = jnp.linalg.inv(HTH + P_scaled_inv)
            G = jnp.zeros((DIM_STATE, DIM_STATE), f32).at[:, 0:6].set(
                K_1[:, 0:6] @ HTH6
            )
            vec = boxminus(state_prop, state)
            sol = -K_1[:, 0:6] @ HTz6 + vec - G[:, 0:6] @ vec[0:6]

            active = ~stop
            accept = active & (error <= last_error)
            new_state = boxplus(state, sol)
            old_state, state = (
                jax.tree.map(lambda old, cur: jnp.where(accept, cur, old),
                             old_state, state),
                jax.tree.map(lambda old, new: jnp.where(accept, new, old),
                             old_state, new_state),
            )
            rot_add = jnp.linalg.norm(sol[0:3])
            t_add = jnp.linalg.norm(sol[3:6])
            converged = (rot_add * 57.3 < 0.001) & (t_add * 100.0 < 0.001)
            G_keep = jnp.where(accept, G, G_keep)
            final_err = jnp.where(accept, error, final_err)
            last_error = jnp.where(accept, error, last_error)
            stop = stop | ~accept | converged
            return (it + 1, state, old_state, last_error, stop, G_keep, final_err)

        def iter_cond(carry):
            it, stop = carry[0], carry[4]
            return (~stop) & (it < cfg.max_iterations)

        init = (jnp.asarray(0, jnp.int32), state, state, jnp.asarray(3e38, f32),
                jnp.asarray(False), G_keep, final_err)
        (_, state, _, _, _, G_keep, final_err) = jax.lax.while_loop(
            iter_cond, iter_body, init
        )

    cov = cov_prop - G_keep @ cov_prop
    return state, cov, final_err


def _make_obs_row(px, Rcw, Pcw, expo, frame_slot, frame_id, mean, score, M):
    """Compose full (M, 20) packed observation rows."""
    Rr = jnp.broadcast_to(Rcw.reshape(9), (M, 9))
    tr = jnp.broadcast_to(Pcw, (M, 3))
    return jnp.concatenate(
        [
            jnp.ones((M, 1)), px, Rr, tr,
            jnp.full((M, 1), expo),
            jnp.full((M, 1), frame_slot, jnp.float32),
            jnp.full((M, 1), frame_id, jnp.float32),
            mean[:, None], score[:, None],
        ],
        axis=-1,
    )


def _generate_rows(pool_alloc, img, pg_w, pg_normal, pg_var6, pg_valid,
                   cell_occupied, state: NavState, cam: cam_mod.Camera,
                   Rci, Pci, frame_id, frame_slot, cfg: VIOConfig):
    """Row-level core of new-point generation (generateVisualMapPoints,
    vio.cpp:804-906): best Shi-Tomasi candidate per empty grid cell.
    Returns (slot (M,) with P for dropped, point_rows, obs_rows,
    patch_rows, n_added)."""
    ps = cfg.patch_size
    M = n_cells(cfg)
    P = cfg.pool_capacity
    K = cfg.max_obs
    Rcw, Pcw = camera_pose(state, Rci, Pci)

    pc = pg_w @ Rcw.T + Pcw
    px = cam_mod.world2cam(cam, pc)
    has_normal = jnp.any(pg_normal != 0.0, axis=-1)  # (:811)
    cand = (
        pg_valid & has_normal & (pc[:, 2] > 0)
        & cam_mod.in_frame(cam, px, border_px(cfg))
    )
    cell = (
        jnp.clip(px[:, 1].astype(jnp.int32) // cfg.grid_size, 0, cfg.grid_n_height - 1)
        * cfg.grid_n_width
        + jnp.clip(px[:, 0].astype(jnp.int32) // cfg.grid_size, 0, cfg.grid_n_width - 1)
    )
    score = img_ops.shi_tomasi(img, px)
    cand = cand & ~cell_occupied[cell]
    win = _cell_argbest(cell, score, cand, M, "max")  # (M,) pg idx or -1

    chosen = win >= 0
    gi = jnp.where(chosen, win, 0)
    # One packed gather for the winners' pos/normal/cov rows.
    g12 = jnp.concatenate([pg_w, pg_normal, pg_var6], axis=-1)[gi]  # (M, 12)
    new_pos = g12[:, 0:3]
    nrm = g12[:, 3:6]
    new_var6 = g12[:, 6:12]
    # Normal sign: point it toward the camera (:867-890).
    norm_cam = jnp.einsum("ij,mj->mi", Rcw, nrm)
    dir_cam = new_pos @ Rcw.T + Pcw
    dir_cam = dir_cam / jnp.maximum(
        jnp.linalg.norm(dir_cam, axis=-1, keepdims=True), 1e-9
    )
    flip = jnp.sum(dir_cam * norm_cam, axis=-1) < 0
    new_normal = jnp.where(flip[:, None], -nrm, nrm)

    offset = jnp.cumsum(chosen.astype(jnp.int32)) - 1
    n_added = jnp.sum(chosen.astype(jnp.int32))
    slot = jnp.where(
        chosen, (pool_alloc.astype(jnp.int32) + offset) % P, P
    )  # drop when P

    new_px = cam_mod.world2cam(cam, new_pos @ Rcw.T + Pcw)
    patch = img_ops.sample_patches(img, new_px, jnp.ones(M, jnp.int32), ps)

    point_rows = jnp.concatenate(
        [
            new_pos, new_normal, new_normal, new_var6,
            jnp.ones((M, 1)),        # valid
            jnp.zeros((M, 1)),       # converged
            jnp.ones((M, 1)),        # has_ref
            jnp.zeros((M, 1)),       # ref_slot = 0
        ],
        axis=-1,
    )
    obs0 = _make_obs_row(new_px, Rcw, Pcw, state.inv_expo, frame_slot,
                         frame_id, jnp.mean(patch, axis=-1), jnp.zeros(M), M)
    obs_rows = jnp.zeros((M, K, OBS_W)).at[:, 0, :].set(obs0)
    patch_rows = jnp.zeros((M, K, ps * ps)).at[:, 0, :].set(patch)
    return slot, point_rows, obs_rows, patch_rows, n_added


def generate_points(pool: VisualPool, img, pg_w, pg_normal, pg_var6, pg_valid,
                    cell_occupied, state: NavState, cam: cam_mod.Camera,
                    Rci, Pci, frame_id, frame_slot, cfg: VIOConfig):
    """Standalone new-point generation (row core + scatter); vio_step uses
    the fused generate+maintain scatter instead. Allocation wraps the pool
    (oldest slots recycled). pg_var6: (N, 6) sym6 point covariances.
    Returns (pool, n_added)."""
    slot, point_rows, obs_rows, patch_rows, n_added = _generate_rows(
        pool.alloc, img, pg_w, pg_normal, pg_var6, pg_valid, cell_occupied,
        state, cam, Rci, Pci, frame_id, frame_slot, cfg,
    )
    pool = pool._replace(
        point=pool.point.at[slot].set(point_rows, mode="drop"),
        obs=pool.obs.at[slot].set(obs_rows, mode="drop"),
        obs_patch=pool.obs_patch.at[slot].set(patch_rows, mode="drop"),
        alloc=pool.alloc + n_added.astype(jnp.float32),
    )
    return pool, n_added


def _update_obs_rows(point_rows, obs_rows, patches, submap: Submap, img,
                     state: NavState, cam: cam_mod.Camera, Rci, Pci,
                     frame_id, frame_slot, cfg: VIOConfig):
    """Row-level core of the observation update (updateVisualMapPoints,
    vio.cpp:908-967) over pre-gathered (M, ...) pool rows. Returns
    (point_rows, obs_rows, patches, update_flag (M,))."""
    ps = cfg.patch_size
    K = cfg.max_obs
    M = submap.valid.shape[0]
    Rcw, Pcw = camera_pose(state, Rci, Pci)
    conv = (point_rows[:, _P_CONV] > 0.5) & submap.valid
    ref_slot = point_rows[:, _P_REF].astype(jnp.int32)

    # deleteNonRefPatchFeatures: keep only the ref slot (full-row RMW).
    keep_only_ref = (
        jax.lax.broadcasted_iota(jnp.int32, (M, K), 1) == ref_slot[:, None]
    )
    obs_valid0 = obs_rows[:, :, _O_VALID] > 0.5
    new_valid = jnp.where(
        conv[:, None], obs_valid0 & keep_only_ref, obs_valid0
    )
    obs_rows = obs_rows.at[:, :, _O_VALID].set(new_valid.astype(jnp.float32))

    lane_ok = submap.valid & ~conv
    px = cam_mod.world2cam(cam, point_rows[:, _P_POS] @ Rcw.T + Pcw)

    fid = jnp.where(new_valid, obs_rows[:, :, _O_FID], -1.0)
    last = jnp.argmax(fid, axis=-1)  # most recent obs
    last_obs = jnp.take_along_axis(obs_rows, last[:, None, None], axis=1)[:, 0, :]
    R_l = last_obs[:, _O_R].reshape(M, 3, 3)
    t_l = last_obs[:, _O_T]
    px_l = last_obs[:, _O_PX]
    # delta_pose = pose_ref * pose_cur^{-1} (:935-939)
    R_d = R_l @ Rcw.T
    t_d = t_l - jnp.einsum("mij,j->mi", R_d, Pcw)
    delta_p = jnp.linalg.norm(t_d, axis=-1)
    tr = jnp.clip((R_d[:, 0, 0] + R_d[:, 1, 1] + R_d[:, 2, 2] - 1.0) * 0.5, -1.0, 1.0)
    delta_theta = jnp.arccos(tr)
    pixel_dist = jnp.linalg.norm(px - px_l, axis=-1)
    add = lane_ok & (
        (delta_p > cfg.select_obs_gap_p)
        | (delta_theta > cfg.select_obs_gap_theta)
        | (pixel_dist > cfg.select_obs_gap_px)
    )

    # Slot choice: first free, else min-score eviction (:946-953).
    any_free = jnp.any(~new_valid, axis=-1)
    first_free = jnp.argmax(~new_valid, axis=-1).astype(jnp.int32)
    evict = jnp.argmin(
        jnp.where(new_valid, obs_rows[:, :, _O_SCORE], 3e38), axis=-1
    ).astype(jnp.int32)
    wslot = jnp.where(any_free, first_free, evict)
    # Evicting the ref drops the cached ref (visual_point.cpp:113-127).
    ref_killed = ~any_free & (wslot == ref_slot)
    point_rows = point_rows.at[:, _P_HASREF].set(
        jnp.where(add & ref_killed, 0.0, point_rows[:, _P_HASREF])
    )

    patch = img_ops.sample_patches(img, px, jnp.ones(M, jnp.int32), ps)
    new_obs = _make_obs_row(px, Rcw, Pcw, state.inv_expo, frame_slot, frame_id,
                            jnp.mean(patch, axis=-1), jnp.zeros(M), M)
    write_row = (
        jax.lax.broadcasted_iota(jnp.int32, (M, K), 1) == wslot[:, None]
    ) & add[:, None]
    obs_rows = jnp.where(write_row[:, :, None], new_obs[:, None, :], obs_rows)
    patches = jnp.where(write_row[:, :, None], patch[:, None, :], patches)
    return point_rows, obs_rows, patches, add


def update_obs(pool: VisualPool, submap: Submap, img, state: NavState,
               cam: cam_mod.Camera, Rci, Pci, frame_id, frame_slot,
               cfg: VIOConfig):
    """Standalone observation update (gather + core + scatter); vio_step
    uses the fused maintain_points instead. Returns (pool, update_flag)."""
    P = cfg.pool_capacity
    pidx = submap.point_idx
    point_rows, obs_rows, patches, add = _update_obs_rows(
        submap.point_rows, submap.obs_rows, submap.patch_rows, submap, img,
        state, cam, Rci, Pci, frame_id, frame_slot, cfg,
    )
    wp = jnp.where(submap.valid, pidx, P)
    pool = pool._replace(
        point=pool.point.at[wp].set(point_rows, mode="drop"),
        obs=pool.obs.at[wp].set(obs_rows, mode="drop"),
        obs_patch=pool.obs_patch.at[wp].set(patches, mode="drop"),
    )
    return pool, add


def _update_reference_rows(point_rows, obs_rows, patches,
                           vmap_state: VoxelMap, map_cfg: VoxelMapConfig,
                           submap: Submap, updated: jnp.ndarray,
                           cfg: VIOConfig):
    """Row-level core of the reference refinement (updateReferencePatch,
    vio.cpp:969-1100) over pre-gathered (M, ...) pool rows. Returns
    (point_rows, obs_rows)."""
    K = cfg.max_obs
    M = submap.valid.shape[0]
    obs_valid = obs_rows[:, :, _O_VALID] > 0.5
    n_obs = jnp.sum(obs_valid, axis=-1)
    conv = point_rows[:, _P_CONV] > 0.5
    lane = submap.valid & updated & ~conv & (n_obs > 5)

    pos = point_rows[:, _P_POS]
    found, pn, pd, pcen, prad, psigma = query_plane(vmap_state, pos, map_cfg)
    dis = jnp.sum(pn * pos, axis=-1) + pd
    a = pos - pcen
    dc2 = jnp.sum(a * a, axis=-1)
    range_ok = jnp.clip(dc2 - dis * dis, 0.0, None) <= (3.0 * prad) ** 2
    from .voxel_map import quad6

    sigma_l = psigma + quad6(point_rows[:, _P_COV], pn)
    gate = jnp.abs(dis) < 3.0 * jnp.sqrt(jnp.clip(sigma_l, 1e-12, None))
    refine = lane & found & range_ok & gate

    prev = point_rows[:, _P_PRV]
    sign = jnp.where(jnp.sum(prev * pn, axis=-1) < 0, -1.0, 1.0)
    new_normal = sign[:, None] * pn
    normal_update = jnp.linalg.norm(new_normal - prev, axis=-1)
    new_conv = refine & (normal_update < 1e-4) & (n_obs > 10)

    point_rows = point_rows.at[:, _P_NRM].set(
        jnp.where(refine[:, None], new_normal, point_rows[:, _P_NRM])
    )
    point_rows = point_rows.at[:, _P_PRV].set(
        jnp.where(refine[:, None], new_normal, point_rows[:, _P_PRV])
    )
    point_rows = point_rows.at[:, _P_CONV].set(
        jnp.where(new_conv, 1.0, point_rows[:, _P_CONV])
    )

    # --- observation re-scoring (:1036-1097) ---
    means = jnp.mean(patches, axis=-1)
    cen = patches - means[..., None]
    num = jnp.einsum("mkp,mlp->mkl", cen, cen)
    den = jnp.sqrt(
        jnp.einsum("mkp,mkp->mk", cen, cen)[:, :, None]
        * jnp.einsum("mlp,mlp->ml", cen, cen)[:, None, :]
        + 1e-10
    )
    ncc = jnp.abs(num / den)  # (M, K, K)
    pair = obs_valid[:, :, None] & obs_valid[:, None, :] & ~jnp.eye(K, dtype=bool)
    cnt = jnp.maximum(jnp.sum(pair, axis=-1), 1)
    ncc_mean = jnp.sum(jnp.where(pair, ncc, 0.0), axis=-1) / cnt

    R_obs = obs_rows[:, :, _O_R].reshape(M, K, 3, 3)
    pf = jnp.einsum("mkij,mj->mki", R_obs, pos) + obs_rows[:, :, _O_T]
    pf = pf / jnp.maximum(jnp.linalg.norm(pf, axis=-1, keepdims=True), 1e-9)
    nrm = jnp.einsum("mkij,mj->mki", R_obs, point_rows[:, _P_NRM])
    cos_angle = jnp.sum(pf * nrm, axis=-1)
    score = jnp.where(obs_valid, ncc_mean + cos_angle, -3e38)
    best = jnp.argmax(score, axis=-1).astype(jnp.float32)

    obs_rows = obs_rows.at[:, :, _O_SCORE].set(jnp.where(obs_valid, score, 0.0))
    obs_rows = obs_rows.at[:, :, _O_MEAN].set(means)
    point_rows = point_rows.at[:, _P_REF].set(
        jnp.where(lane, best, point_rows[:, _P_REF])
    )
    point_rows = point_rows.at[:, _P_HASREF].set(
        jnp.where(lane, 1.0, point_rows[:, _P_HASREF])
    )
    return point_rows, obs_rows


def update_reference(pool: VisualPool, vmap_state: VoxelMap,
                     map_cfg: VoxelMapConfig, submap: Submap,
                     updated: jnp.ndarray, cfg: VIOConfig):
    """Standalone reference refinement (gather + core + scatter); vio_step
    uses the fused maintain_points instead."""
    P = cfg.pool_capacity
    pidx = submap.point_idx
    point_rows, obs_rows = _update_reference_rows(
        submap.point_rows, submap.obs_rows, submap.patch_rows,
        vmap_state, map_cfg, submap, updated, cfg,
    )
    wl = jnp.where(submap.valid, pidx, P)
    return pool._replace(
        point=pool.point.at[wl].set(point_rows, mode="drop"),
        obs=pool.obs.at[wl].set(obs_rows, mode="drop"),
    )


def maintain_points(pool: VisualPool, vmap_state: VoxelMap,
                    map_cfg: VoxelMapConfig, submap: Submap, img,
                    state: NavState, cam: cam_mod.Camera, Rci, Pci,
                    frame_id, frame_slot, cfg: VIOConfig):
    """Fused observation update + reference refinement: both stages
    operate on the SAME pool rows (submap.point_idx), so gathering once
    and scattering once halves the random-access traffic of the two
    reference passes (updateVisualMapPoints + updateReferencePatch,
    vio.cpp:908-1100 — sequential loops there; one gather/scatter pair
    here). Returns (pool, update_flag (M,))."""
    P = cfg.pool_capacity
    pidx = submap.point_idx
    point_rows, obs_rows, patches, add = _update_obs_rows(
        submap.point_rows, submap.obs_rows, submap.patch_rows, submap, img,
        state, cam, Rci, Pci, frame_id, frame_slot, cfg,
    )
    point_rows, obs_rows = _update_reference_rows(
        point_rows, obs_rows, patches, vmap_state, map_cfg, submap, add, cfg,
    )
    wp = jnp.where(submap.valid, pidx, P)
    pool = pool._replace(
        point=pool.point.at[wp].set(point_rows, mode="drop"),
        obs=pool.obs.at[wp].set(obs_rows, mode="drop"),
        obs_patch=pool.obs_patch.at[wp].set(patches, mode="drop"),
    )
    return pool, add


def generate_and_maintain(pool: VisualPool, vmap_state: VoxelMap,
                          map_cfg: VoxelMapConfig, submap: Submap, img,
                          pg_w, pg_normal, pg_var6, pg_valid,
                          state: NavState, cam: cam_mod.Camera, Rci, Pci,
                          frame_id, frame_slot, cfg: VIOConfig):
    """Fused new-point generation + observation update + reference
    refinement with ONE scatter per pool array: random-access ops on this
    chip are latency-bound (~0.7 ms floor each regardless of row count),
    so concatenating the two stages' row writes halves the maintenance
    scatter count. Maintained rows that collide with a freshly allocated
    slot (pool wrap recycling a currently-tracked point) are dropped in
    favor of the new point — the reference's recycle-oldest semantics.
    Returns (pool, n_tracked_updated, n_added)."""
    P = cfg.pool_capacity
    pidx = submap.point_idx
    point_m, obs_m, patch_m, add = _update_obs_rows(
        submap.point_rows, submap.obs_rows, submap.patch_rows, submap, img,
        state, cam, Rci, Pci, frame_id, frame_slot, cfg,
    )
    point_m, obs_m = _update_reference_rows(
        point_m, obs_m, patch_m, vmap_state, map_cfg, submap, add, cfg,
    )
    slot_g, point_g, obs_g, patch_g, n_added = _generate_rows(
        pool.alloc, img, pg_w, pg_normal, pg_var6, pg_valid, submap.valid,
        state, cam, Rci, Pci, frame_id, frame_slot, cfg,
    )
    wp = jnp.where(submap.valid, pidx, P)
    # Drop maintained rows whose slot is being re-allocated this frame
    # (deterministic winner instead of XLA's unspecified duplicate order).
    collide = jnp.any(wp[:, None] == slot_g[None, :], axis=1)
    wp = jnp.where(collide, P, wp)
    idx = jnp.concatenate([wp, slot_g])
    pool = pool._replace(
        point=pool.point.at[idx].set(
            jnp.concatenate([point_m, point_g]), mode="drop"),
        obs=pool.obs.at[idx].set(
            jnp.concatenate([obs_m, obs_g]), mode="drop"),
        obs_patch=pool.obs_patch.at[idx].set(
            jnp.concatenate([patch_m, patch_g]), mode="drop"),
        alloc=pool.alloc + n_added.astype(jnp.float32),
    )
    return pool, add, n_added


def ring_insert(pool: VisualPool, ring: FrameRing, img, frame_id, cfg: VIOConfig):
    """Write the frame into its ring slot and invalidate observations that
    referenced the evicted frame. Returns (pool, ring, slot)."""
    F = cfg.frame_ring
    slot = frame_id % F
    ring = FrameRing(
        imgs=ring.imgs.at[slot].set(img),
        ids=ring.ids.at[slot].set(frame_id),
    )
    obs_valid = pool.obs[:, :, _O_VALID] > 0.5
    evicted = (
        (pool.obs[:, :, _O_SLOT].astype(jnp.int32) == slot)
        & (pool.obs[:, :, _O_FID].astype(jnp.int32) != frame_id)
    )
    new_valid = obs_valid & ~evicted
    obs = pool.obs.at[:, :, _O_VALID].set(new_valid.astype(jnp.float32))
    # Points whose ref obs died lose the cached ref; 0-obs points die.
    # One-hot reduce instead of take_along_axis: a (P,)-row gather is
    # latency-bound (~ms) while the (P, K) vector compare is free.
    ref_slot = pool.point[:, _P_REF].astype(jnp.int32)
    oh = ref_slot[:, None] == jax.lax.broadcasted_iota(jnp.int32, (1, cfg.max_obs), 1)
    ref_alive = jnp.any(new_valid & oh, axis=1)
    point = pool.point.at[:, _P_HASREF].set(
        pool.point[:, _P_HASREF] * ref_alive.astype(jnp.float32)
    )
    point = point.at[:, _P_VALID].set(
        point[:, _P_VALID] * jnp.any(new_valid, axis=-1).astype(jnp.float32)
    )
    return pool._replace(point=point, obs=obs), ring, slot


class VIOStepResult(NamedTuple):
    state: NavState
    cov: jnp.ndarray
    pool: VisualPool
    ring: FrameRing
    n_tracked: jnp.ndarray
    n_added: jnp.ndarray
    mean_error: jnp.ndarray


def vio_step(state_prop: NavState, cov_prop, pool: VisualPool, ring: FrameRing,
             vmap_state: VoxelMap, img, pg_w, pg_normal, pg_var, pg_valid,
             frame_id, cam: cam_mod.Camera, Rci, Pci, cfg: VIOConfig,
             map_cfg: VoxelMapConfig, ray_table=None) -> VIOStepResult:
    """One full VIO frame (processFrame, vio.cpp:1786-1876): retrieval →
    iterated photometric update → new-point generation → observation
    update → reference/normal refinement → optional raycast recovery.
    pg_var: (N, 3, 3) or (N, 6) sym6."""
    pg_var6 = pg_var if pg_var.ndim == 2 else sym6(pg_var)
    pool, ring, frame_slot = ring_insert(pool, ring, img, frame_id, cfg)

    Rcw0, Pcw0 = camera_pose(state_prop, Rci, Pci)
    depth_img = rasterize_depth(cam, Rcw0, Pcw0, pg_w, pg_valid, border_px(cfg))

    submap, pool = retrieve(pool, ring, img, depth_img, state_prop, cam, Rci, Pci, cfg)
    n_tracked = jnp.sum(submap.valid.astype(jnp.int32))

    if cfg.inverse_composition_en:
        state, cov, mean_err = photometric_update_ic(
            state_prop, cov_prop, submap, img, ring, cam, Rci, Pci, cfg
        )
    else:
        state, cov, mean_err = photometric_update(
            state_prop, cov_prop, submap, img, cam, Rci, Pci, cfg
        )

    if cfg.raycast_en and ray_table is not None:
        from ..ops import voxel_hash

        ray_samples, border_cell = ray_table
        scan_tab, _ = voxel_hash.lookup_or_insert(
            voxel_hash.make_table(8192),
            voxel_hash.voxel_key(pg_w, map_cfg.voxel_size), pg_valid,
        )
        rc_pos, rc_nrm, rc_ok = raycast_recover(
            vmap_state, map_cfg, ~submap.valid, border_cell, ray_samples,
            scan_tab, state, Rci, Pci,
        )
        rc_var6 = jnp.tile(
            jnp.asarray([1e-2, 0, 0, 1e-2, 0, 1e-2], pg_var6.dtype),
            (rc_pos.shape[0], 1),
        )
        pg_w = jnp.concatenate([pg_w, rc_pos])
        pg_normal = jnp.concatenate([pg_normal, rc_nrm])
        pg_var6 = jnp.concatenate([pg_var6, rc_var6])
        pg_valid = jnp.concatenate([pg_valid, rc_ok])

    pool, updated, n_added = generate_and_maintain(
        pool, vmap_state, map_cfg, submap, img, pg_w, pg_normal, pg_var6,
        pg_valid, state, cam, Rci, Pci, frame_id, frame_slot, cfg
    )

    return VIOStepResult(
        state=state, cov=cov, pool=pool, ring=ring,
        n_tracked=n_tracked, n_added=n_added, mean_error=mean_err,
    )


def capture_photo_factors(pool: VisualPool, ring: FrameRing, img, state,
                          pg_w, pg_valid, cam: cam_mod.Camera, Rci, Pci,
                          cfg: VIOConfig, map_cfg=None):
    """Photometric factor capture for the sliding-window backend
    (parallel/ba.PhotoFactors; VERDICT r4 item 4). Re-runs the frame's
    retrieval against the visual map at the keyframe's posterior state
    and packs the exposure-normalized reference patches as fixed
    targets:

        target = tau_ref * I_ref(warped)        (vio.cpp:1621's
                                                 tau_ref * I_ref term)

    The backend's photometric residual for this keyframe is then
        r = tau_k * I_k(pi(T_k^-1 p_w)) - target
    with only the keyframe pose free (points, targets, exposure fixed) —
    the reference's measurement model (vio.cpp:1520-1688) reduced to a
    pose factor. Returns (pos (M,3), target (M,ps^2), valid (M,),
    scale (M,) int32)."""
    Rcw, Pcw = camera_pose(state, Rci, Pci)
    depth_img = rasterize_depth(cam, Rcw, Pcw, pg_w, pg_valid,
                                border_px(cfg))
    submap, _ = retrieve(pool, ring, img, depth_img, state, cam, Rci, Pci,
                         cfg)
    target = submap.ref_expo[:, None] * submap.warp_patch[:, 0, :]
    scale = (1 << submap.search_level.astype(jnp.int32))
    return submap.pos, target, submap.valid, scale


def colorize_points(img, pts_w, valid, state: NavState, cam: cam_mod.Camera,
                    Rci, Pci, blind: float = 0.0):
    """Sample per-point image intensity/color at the projected location
    (publish_frame_world's RGB rendering, LIVMapper.cpp:1133-1290, via
    getInterpolatedPixel, vio.cpp:1742-1760). img: (H, W) gray or
    (H, W, 3). Returns (colors (N, C), visible (N,))."""
    Rcw, Pcw = camera_pose(state, Rci, Pci)
    pc = pts_w @ Rcw.T + Pcw
    px = cam_mod.world2cam(cam, pc)
    vis = (
        valid & (pc[:, 2] > blind)
        & cam_mod.in_frame(cam, px, 1)
    )
    if img.ndim == 2:
        img = img[:, :, None]
    chans = [img_ops.bilinear(img[:, :, c], px) for c in range(img.shape[2])]
    colors = jnp.stack(chans, axis=-1)
    return jnp.where(vis[:, None], colors, 0.0), vis


def make_ray_table(cam: cam_mod.Camera, cfg: VIOConfig,
                   d_min: float = 0.1, d_max: float = 3.0, step: float = 0.2):
    """Per-grid-cell raycast sample table (initializeVIO, vio.cpp:91-118):
    unit bearings through each cell center scaled by a fixed depth ladder.
    Returns (samples_cam (M, S, 3), border_cell (M,))."""
    import numpy as np

    gs, gnw, gnh = cfg.grid_size, cfg.grid_n_width, cfg.grid_n_height
    rows, cols = np.meshgrid(np.arange(gnh), np.arange(gnw), indexing="ij")
    u = (gs // 2 + cols * gs).reshape(-1).astype(np.float32)
    v = (gs // 2 + rows * gs).reshape(-1).astype(np.float32)
    border = (
        (rows == 0) | (cols == 0) | (rows == gnh - 1) | (cols == gnw - 1)
    ).reshape(-1)
    f = cam_mod.cam2world(cam, jnp.stack([jnp.asarray(u), jnp.asarray(v)], axis=-1))
    f = f / f[:, 2:3]  # unit depth
    depths = jnp.arange(d_min, d_max + 1e-6, step, dtype=jnp.float32)
    samples = f[:, None, :] * depths[None, :, None]  # (M, S, 3)
    return samples, jnp.asarray(border)


def raycast_recover(vmap_state: VoxelMap, map_cfg: VoxelMapConfig,
                    cell_empty: jnp.ndarray, border_cell: jnp.ndarray,
                    ray_samples: jnp.ndarray, scan_keys_table,
                    state: NavState, Rci, Pci):
    """Raycast recovery for LiDAR-blind grid cells (vio.cpp:487-591):
    walk each empty, non-border cell's ray through the voxel grid; the
    first sample whose voxel holds an LIO plane (and that is not occupied
    by the current scan) contributes a candidate visual point at the plane
    center with the plane normal (consumed by generate_points like the
    reference's add_from_voxel_map list, vio.cpp:834-854).

    The reference's other raycast outcome — re-projecting visual points of
    voxels found along the ray — is subsumed here because retrieval
    already projects the entire pool every frame.

    Returns (cand_pos (M, 3), cand_normal (M, 3), cand_valid (M,))."""
    from ..ops import voxel_hash

    M, S, _ = ray_samples.shape
    Rcw, Pcw = camera_pose(state, Rci, Pci)
    R_wc = Rcw.T
    cam_origin = -R_wc @ Pcw
    pts_w = ray_samples.reshape(-1, 3) @ R_wc.T + cam_origin  # (M*S, 3)

    keys0 = voxel_hash.voxel_key(pts_w, map_cfg.voxel_size)
    touched = voxel_hash.lookup(scan_keys_table, keys0) >= 0  # scan occupancy
    found, normal, d, center, radius, sigma = query_plane(vmap_state, pts_w, map_cfg)

    touched = touched.reshape(M, S)
    found = found.reshape(M, S)
    # Stop at the first scan-touched voxel (reference breaks there, :517).
    blocked = jnp.cumsum(touched.astype(jnp.int32), axis=1) > 0
    usable = found & ~blocked
    first = jnp.argmax(usable, axis=1)  # first True (0 if none)
    has = jnp.any(usable, axis=1) & cell_empty & ~border_cell
    take = first + jnp.arange(M) * S
    return (
        center.reshape(M * S, 3)[take],
        normal.reshape(M * S, 3)[take],
        has,
    )
