"""The LIO geometric map: multi-layer voxel plane statistics in HBM.

TPU-native re-design of VoxelMapManager + VoxelOctoTree (reference
include/voxel_map.h:129-257, src/voxel_map.cpp:55-335). The pointer-based
adaptive octree becomes L stacked open-addressing hash layers (layer l
has voxel size v / 2^l), all carried with a leading layer axis and
processed with one vmapped op set per frame — the per-layer Python loop
tripled kernel dispatch for no benefit. A voxel accumulates *running*
plane statistics in voxel-local coordinates:

    count, sum_p = Σ (p_i - voxel_center), sum_pp = Σ (p_i - c)(p_i - c)^T,
    sum_C = Σ C_i   (C_i = world covariance of point i)

from which mean / scatter covariance / plane fit are recovered exactly.
Local coordinates keep the Σpp^T - mean mean^T cancellation benign in
float32 (|p_local| <= voxel diagonal instead of absolute world position).

Storage is packed for op count: all float statistics in one (L, C, 15)
array and plane parameters in (L, C, 8) + (L, C, 12), symmetric 3x3s as
6-vectors, so a probe/gather/scatter touches one array.

The reference's octree semantics map onto layer masks:
- a layer-l voxel is *active* for matching iff it is a fitted plane AND
  its ancestors at layers < l exist but failed the plane test
  (voxel_map.cpp:137-161 init/cut, :292-305 find_correspond);
- voxels freeze (stop accumulating) once count >= max_points_num
  (:146-151, :240-245).

Plane-parameter covariance. The reference propagates per-point 3x3
covariances through the eigen-decomposition Jacobian, summing
J_i C_i J_i^T over all member points (init_plane, voxel_map.cpp:88-111) —
which requires storing every member point. We instead evaluate that same
sum in closed form under the approximation C_i ≈ C̄ (the running average
point covariance, isotropized to σ̄² = tr(C̄)/3 for the normal block).
Carrying the reference's J_i through Σ_i and using Σ_i (p_i-c) = 0 and
Σ_i (p_i-c)(p_i-c)^T = N U Λ U^T gives:

    cov(n)      = σ̄² U diag_m[ (λ_m + λ_min) / (N (λ_min - λ_m)^2) ] U^T
                  (entry 0 for m = min)
    cov(q)      = C̄ / N            (q = plane center)
    cov(n, q)   = 0                 (cross terms vanish exactly)

so the per-voxel state stays O(1) and the per-frame refit is one batched
closed-form 3x3 eigendecomposition over touched voxels. σ_l gating then
reads σ_l = a^T cov(n) a + n^T cov(q) n, a = p_w - center, matching
J_nq = [p_w - center, -n] of the reference (:732-736).
"""

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import eig3, voxel_hash
from ..ops.voxel_hash import HashTable

# stats layout: [sum_p (0:3) | sum_pp sym6 (3:9) | sum_C sym6 (9:15)]
STATS_W = 15
# plane layout: [normal (0:3) | d (3) | center (4:7) | radius (7)]
PLANE_W = 8
# plane_cov layout: [cov_nn sym6 (0:6) | cov_qq sym6 (6:12)]
PCOV_W = 12


def sym6(m):
    """(..., 3, 3) symmetric -> (..., 6) as (xx, xy, xz, yy, yz, zz)."""
    return jnp.stack(
        [m[..., 0, 0], m[..., 0, 1], m[..., 0, 2],
         m[..., 1, 1], m[..., 1, 2], m[..., 2, 2]], axis=-1,
    )


def sym6_to_mat(s):
    """(..., 6) -> (..., 3, 3)."""
    xx, xy, xz, yy, yz, zz = (s[..., i] for i in range(6))
    return jnp.stack(
        [
            jnp.stack([xx, xy, xz], axis=-1),
            jnp.stack([xy, yy, yz], axis=-1),
            jnp.stack([xz, yz, zz], axis=-1),
        ],
        axis=-2,
    )


def quad6(s, v):
    """v^T M v for sym6 M (..., 6) and vectors v (..., 3), no 3x3
    materialization."""
    vx, vy, vz = v[..., 0], v[..., 1], v[..., 2]
    return (
        s[..., 0] * vx * vx + s[..., 3] * vy * vy + s[..., 5] * vz * vz
        + 2.0 * (s[..., 1] * vx * vy + s[..., 2] * vx * vz + s[..., 4] * vy * vz)
    )


class VoxelMap(NamedTuple):
    """All layers stacked on a leading L axis."""

    keys: jnp.ndarray  # (L, C, 3) int32, EMPTY-marked free slots
    count: jnp.ndarray  # (L, C) int32
    stats: jnp.ndarray  # (L, C, 15)
    is_plane: jnp.ndarray  # (L, C) bool
    plane: jnp.ndarray  # (L, C, 8)
    plane_cov: jnp.ndarray  # (L, C, 12)


class VoxelMapConfig(NamedTuple):
    """Static (compile-time) map configuration."""

    voxel_size: float = 0.5
    n_layers: int = 3  # reference max_layer=2 -> layers 0..2
    capacity_log2: int = 18
    probes: int = 8
    planner_threshold: float = 0.0025  # min_eigen_value
    sigma_num: float = 3.0
    layer_init_num: Sequence[int] = (5, 5, 5, 5, 5)
    max_points_num: int = 50


def make_map(cfg: VoxelMapConfig) -> VoxelMap:
    L, C = cfg.n_layers, 1 << cfg.capacity_log2
    f = jnp.float32
    return VoxelMap(
        keys=jnp.full((L, C, 3), voxel_hash.EMPTY, jnp.int32),
        count=jnp.zeros((L, C), jnp.int32),
        stats=jnp.zeros((L, C, STATS_W), f),
        is_plane=jnp.zeros((L, C), bool),
        plane=jnp.zeros((L, C, PLANE_W), f),
        plane_cov=jnp.zeros((L, C, PCOV_W), f),
    )


def layer_voxel_sizes(cfg: VoxelMapConfig) -> jnp.ndarray:
    return jnp.asarray(
        [cfg.voxel_size / (1 << l) for l in range(cfg.n_layers)], jnp.float32
    )


def layer_init_nums(cfg: VoxelMapConfig) -> jnp.ndarray:
    nums = [
        cfg.layer_init_num[min(l, len(cfg.layer_init_num) - 1)]
        for l in range(cfg.n_layers)
    ]
    return jnp.asarray(nums, jnp.float32)


def _layer_keys(pts_w: jnp.ndarray, vsizes: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) world points -> (L, N, 3) per-layer voxel keys."""
    return jnp.floor(pts_w[None, :, :] / vsizes[:, None, None]).astype(jnp.int32)


def _fit_planes_one(keys_tab, count, stats, is_plane, plane, plane_cov,
                    slots, vsize, init_num, cfg: VoxelMapConfig):
    """Single-layer batched plane refit (vmapped over layers). Mirrors
    init_plane (voxel_map.cpp:55-135) with the closed-form plane
    covariance from the module docstring."""
    valid = slots >= 0
    s = jnp.where(valid, slots, 0)

    n = count[s].astype(jnp.float32)
    n_safe = jnp.maximum(n, 1.0)
    st = stats[s]  # (N, 15)
    mean_local = st[:, 0:3] / n_safe[:, None]
    cov6 = st[:, 3:9] / n_safe[:, None] - sym6(
        mean_local[:, :, None] * mean_local[:, None, :]
    )
    cov = sym6_to_mat(cov6) + jnp.eye(3) * 1e-9
    # Closed-form 3x3 eigensolver (ops/eig3): XLA's iterative eigh
    # dominated compile+run time for these (N, 3, 3) batches.
    evals, evecs = eig3.eigh3(cov)  # ascending
    lam0, lam1, lam2 = evals[:, 0], evals[:, 1], evals[:, 2]
    enough = n > init_num
    new_is_plane = (lam0 < cfg.planner_threshold) & enough

    voxel_center = (keys_tab[s].astype(jnp.float32) + 0.5) * vsize
    center_w = voxel_center + mean_local

    normal = evecs[:, :, 0]
    d = -jnp.sum(normal * center_w, axis=-1)
    radius = jnp.sqrt(jnp.clip(lam2, 0.0, None))
    new_plane = jnp.concatenate(
        [normal, d[:, None], center_w, radius[:, None]], axis=-1
    )

    C_bar6 = st[:, 9:15] / n_safe[:, None]
    sigma2 = (C_bar6[:, 0] + C_bar6[:, 3] + C_bar6[:, 5]) / 3.0
    dmin = 1e-6
    d1 = (lam1 + lam0) / (n_safe * jnp.maximum((lam0 - lam1) ** 2, dmin))
    d2 = (lam2 + lam0) / (n_safe * jnp.maximum((lam0 - lam2) ** 2, dmin))
    D = jnp.zeros_like(evals).at[:, 1].set(d1).at[:, 2].set(d2)
    cov_nn = sigma2[:, None, None] * jnp.einsum("nik,nk,njk->nij", evecs, D, evecs)
    new_pcov = jnp.concatenate([sym6(cov_nn), C_bar6 / n_safe[:, None]], axis=-1)

    w = jnp.where(valid & enough, s, count.shape[0])
    return (
        is_plane.at[w].set(new_is_plane, mode="drop"),
        plane.at[w].set(new_plane, mode="drop"),
        plane_cov.at[w].set(new_pcov, mode="drop"),
    )


def _update_layer_one(keys_tab, count, stats, is_plane, plane, plane_cov,
                      pts_w, var_w6, valid, vsize, init_num,
                      cfg: VoxelMapConfig):
    """Single-layer insert + refit (vmapped over layers)."""
    keys = jnp.floor(pts_w / vsize).astype(jnp.int32)
    table, slots = voxel_hash.lookup_or_insert(
        HashTable(keys=keys_tab), keys, valid, cfg.probes
    )
    keys_tab = table.keys

    ok = valid & (slots >= 0)
    s = jnp.where(ok, slots, 0)
    # Freeze full voxels (update_enable_ flip, voxel_map.cpp:240-245).
    frozen = count[s] >= cfg.max_points_num
    ok = ok & ~frozen
    w = jnp.where(ok, slots, count.shape[0])

    voxel_center = (keys.astype(jnp.float32) + 0.5) * vsize
    p_local = pts_w - voxel_center
    pp6 = sym6(p_local[:, :, None] * p_local[:, None, :])
    contrib = jnp.concatenate([p_local, pp6, var_w6], axis=-1)  # (N, 15)

    count = count.at[w].add(1, mode="drop")
    stats = stats.at[w].add(contrib, mode="drop")
    is_plane, plane, plane_cov = _fit_planes_one(
        keys_tab, count, stats, is_plane, plane, plane_cov,
        jnp.where(ok, slots, -1), vsize, init_num, cfg,
    )
    return keys_tab, count, stats, is_plane, plane, plane_cov


def update_map(vmap_state: VoxelMap, pts_w: jnp.ndarray, var_w: jnp.ndarray,
               valid: jnp.ndarray, cfg: VoxelMapConfig) -> VoxelMap:
    """Insert a frame into every layer with one vmapped op set (the
    flat-layer equivalent of the octree's conditional subdivision —
    inactive layers are masked at query time). var_w: (N, 3, 3) or (N, 6)
    sym6 point world covariances."""
    var_w6 = var_w if var_w.ndim == 2 else sym6(var_w)
    vs = layer_voxel_sizes(cfg)
    inits = layer_init_nums(cfg)
    out = jax.vmap(
        lambda k, c, st, ip, pl, pc, v, ini: _update_layer_one(
            k, c, st, ip, pl, pc, pts_w, var_w6, valid, v, ini, cfg
        )
    )(vmap_state.keys, vmap_state.count, vmap_state.stats, vmap_state.is_plane,
      vmap_state.plane, vmap_state.plane_cov, vs, inits)
    return VoxelMap(*out)


class PlaneMatch(NamedTuple):
    """Per-point plane correspondence (the PointToPlane record of
    voxel_map.h + probability-selected match of voxel_map.cpp:713-767).
    cov_nn/cov_qq are sym6."""

    valid: jnp.ndarray  # (N,) bool
    normal: jnp.ndarray  # (N, 3)
    d: jnp.ndarray  # (N,)
    center: jnp.ndarray  # (N, 3)
    dist: jnp.ndarray  # (N,) signed point-to-plane distance
    sigma_plane: jnp.ndarray  # (N,) a^T cov_nn a + n^T cov_qq n
    cov_nn: jnp.ndarray  # (N, 6)
    cov_qq: jnp.ndarray  # (N, 6)


def _candidate_one(keys_tab, count, is_plane_tab, plane_tab, pcov_tab,
                   keys, pts_w, var_w6, cfg: VoxelMapConfig):
    """Gate one layer's plane against the points (vmapped over layers)."""
    slots = voxel_hash.lookup(HashTable(keys=keys_tab), keys, cfg.probes)
    exists = slots >= 0
    s = jnp.where(exists, slots, 0)
    is_pl = is_plane_tab[s] & exists
    pl = plane_tab[s]  # (N, 8)
    pc = pcov_tab[s]  # (N, 12)
    n = pl[:, 0:3]
    d = pl[:, 3]
    c = pl[:, 4:7]
    radius = pl[:, 7]

    dist = jnp.sum(n * pts_w, axis=-1) + d
    a = pts_w - c
    dc2 = jnp.sum(a * a, axis=-1)
    range_dis2 = jnp.clip(dc2 - dist * dist, 0.0, None)
    in_radius = range_dis2 <= (3.0 * radius) ** 2  # radius_k=3 (:719)

    sigma_plane = quad6(pc[:, 0:6], a) + quad6(pc[:, 6:12], n)
    sigma_l = sigma_plane + quad6(var_w6, n)
    sigma_l = jnp.clip(sigma_l, 1e-12, None)
    gate = jnp.abs(dist) < cfg.sigma_num * jnp.sqrt(sigma_l)
    ok = is_pl & in_radius & gate
    prob = jnp.where(
        ok,
        jax.lax.rsqrt(sigma_l) * jnp.exp(-0.5 * dist * dist / sigma_l),
        -1.0,
    )
    fields = jnp.concatenate(
        [n, d[:, None], c, dist[:, None], sigma_plane[:, None], pc], axis=-1
    )  # (N, 3+1+3+1+1+12 = 21)
    return exists, is_pl, ok, prob, fields


def match_planes(vmap_state: VoxelMap, pts_w: jnp.ndarray, var_w,
                 valid: jnp.ndarray, cfg: VoxelMapConfig) -> PlaneMatch:
    """Point-to-plane correspondence search (BuildResidualListOMP +
    build_single_residual, voxel_map.cpp:643-786) as fixed-shape batch ops.

    Per point we gate up to n_layers + 1 candidates: the containing voxel
    chain (layer l active iff its ancestors exist and are not planes) and
    the nearest neighbor root voxel, which is only considered when the own
    chain fails (:680-691). The max-probability candidate wins. All layers
    evaluate as one vmapped op set; only the tiny chain-mask combination
    is per-layer. Deviations from the reference, by design:
    - sibling sub-voxels are not searched (the reference recurses into all
      8 children; the containing chain covers the dominant match);
    - the neighbor shift uses the point's offset within its voxel in
      meters (the reference compares voxel-unit coordinates with
      meter-unit centers at :683-688, which we read as unintended).
    """
    var_w6 = var_w if var_w.ndim == 2 else sym6(var_w)
    n_pts = pts_w.shape[0]
    vsizes = layer_voxel_sizes(cfg)
    keys_L = _layer_keys(pts_w, vsizes)  # (L, N, 3)
    keys_nb = None

    # Nearest neighbor root voxel by in-voxel offset (quarter-length rule).
    center0 = (keys_L[0].astype(jnp.float32) + 0.5) * cfg.voxel_size
    off = pts_w - center0
    quarter = cfg.voxel_size / 4.0
    shift = jnp.where(off > quarter, 1, jnp.where(off < -quarter, -1, 0)).astype(jnp.int32)
    keys_nb = keys_L[0] + shift

    # All own layers + the neighbor root in ONE vmapped evaluation: stack
    # the neighbor as an extra "layer" that reuses layer 0's table.
    keys_all = jnp.concatenate([keys_L, keys_nb[None]], axis=0)  # (L+1, N, 3)
    idx = list(range(cfg.n_layers)) + [0]
    tab_keys = vmap_state.keys[jnp.asarray(idx)]
    tab_count = vmap_state.count[jnp.asarray(idx)]
    tab_ispl = vmap_state.is_plane[jnp.asarray(idx)]
    tab_plane = vmap_state.plane[jnp.asarray(idx)]
    tab_pcov = vmap_state.plane_cov[jnp.asarray(idx)]

    exists, is_pl, ok, prob, fields = jax.vmap(
        lambda tk, tc, ti, tp, tv, k: _candidate_one(
            tk, tc, ti, tp, tv, k, pts_w, var_w6, cfg
        )
    )(tab_keys, tab_count, tab_ispl, tab_plane, tab_pcov, keys_all)

    # Chain masks (octree descent semantics) — tiny (L, N) logic.
    ancestor_open = jnp.ones(n_pts, bool)
    actives = []
    for li in range(cfg.n_layers):
        active = ancestor_open & ok[li]
        actives.append(active)
        ancestor_open = ancestor_open & exists[li] & ~is_pl[li]
    any_own = jnp.zeros(n_pts, bool)
    for a in actives:
        any_own = any_own | a
    nb_active = ok[cfg.n_layers] & ~any_own
    actives.append(nb_active)
    active = jnp.stack(actives, axis=0)  # (L+1, N)

    probs = jnp.where(active, prob, -1.0)
    best = jnp.argmax(probs, axis=0)
    best_prob = jnp.max(probs, axis=0)
    any_valid = (best_prob > 0) & valid

    f = jnp.take_along_axis(fields, best[None, :, None], axis=0)[0]  # (N, 21)
    return PlaneMatch(
        valid=any_valid,
        normal=f[:, 0:3],
        d=f[:, 3],
        center=f[:, 4:7],
        dist=f[:, 7],
        sigma_plane=f[:, 8],
        cov_nn=f[:, 9:15],
        cov_qq=f[:, 15:21],
    )


def query_plane(vmap_state: VoxelMap, pts_w: jnp.ndarray, cfg: VoxelMapConfig):
    """Ungated plane lookup along the containing chain: the first layer
    whose voxel is a fitted plane wins (VoxelOctoTree::find_correspond,
    voxel_map.cpp:292-305). Used by the VIO normal refinement
    (vio.cpp:981-1034). Returns (found, normal, d, center, radius,
    sigma_l) with sigma_l = a^T cov_nn a + n^T cov_qq n at pts_w."""
    n_pts = pts_w.shape[0]
    vsizes = layer_voxel_sizes(cfg)
    keys_L = _layer_keys(pts_w, vsizes)

    def one(tk, ti, tp, tv, k):
        slots = voxel_hash.lookup(HashTable(keys=tk), k, cfg.probes)
        exists = slots >= 0
        s = jnp.where(exists, slots, 0)
        is_pl = ti[s] & exists
        pl = tp[s]
        pc = tv[s]
        a = pts_w - pl[:, 4:7]
        n = pl[:, 0:3]
        sigma = quad6(pc[:, 0:6], a) + quad6(pc[:, 6:12], n)
        return exists, is_pl, pl, sigma

    exists, is_pl, pl, sigma = jax.vmap(one)(
        vmap_state.keys, vmap_state.is_plane, vmap_state.plane,
        vmap_state.plane_cov, keys_L,
    )
    found = jnp.zeros(n_pts, bool)
    out_plane = jnp.zeros((n_pts, PLANE_W))
    out_sigma = jnp.zeros(n_pts)
    open_chain = jnp.ones(n_pts, bool)
    for li in range(cfg.n_layers):
        hit = open_chain & is_pl[li]
        out_plane = jnp.where(hit[:, None], pl[li], out_plane)
        out_sigma = jnp.where(hit, sigma[li], out_sigma)
        found = found | hit
        open_chain = open_chain & exists[li] & ~is_pl[li]
    return (found, out_plane[:, 0:3], out_plane[:, 3], out_plane[:, 4:7],
            out_plane[:, 7], out_sigma)


def slide_map(vmap_state: VoxelMap, center_pos: jnp.ndarray,
              half_map_size: int, cfg: VoxelMapConfig) -> VoxelMap:
    """Local-map sliding: evict voxels outside a half_map_size box around
    the current position (mapSliding/clearMemOutOfMap,
    voxel_map.cpp:924-971). Open addressing cannot delete slots in place
    (probe chains would break), so each layer is *rebuilt*: surviving keys
    re-inserted into a fresh table and their value rows gathered across.
    Intended to be called rarely (when the pose moved > sliding_thresh,
    like the reference)."""
    vsizes = layer_voxel_sizes(cfg)
    halves = jnp.asarray(
        [half_map_size * (1 << l) for l in range(cfg.n_layers)], jnp.int32
    )
    cap = vmap_state.count.shape[1]

    def one(keys_tab, count, stats, is_plane, plane, plane_cov, vsize, half):
        ctr = jnp.floor(center_pos / vsize).astype(jnp.int32)
        occupied = keys_tab[:, 0] != voxel_hash.EMPTY
        keep = occupied & jnp.all(jnp.abs(keys_tab - ctr) <= half, axis=-1)
        fresh = voxel_hash.make_table(cap)
        fresh, new_slots = voxel_hash.lookup_or_insert(
            fresh, keys_tab, keep, cfg.probes
        )
        dst = jnp.where(keep & (new_slots >= 0), new_slots, cap)

        def move(arr):
            return jnp.zeros_like(arr).at[dst].set(arr, mode="drop")

        return (fresh.keys, move(count), move(stats), move(is_plane),
                move(plane), move(plane_cov))

    out = jax.vmap(one)(vmap_state.keys, vmap_state.count, vmap_state.stats,
                        vmap_state.is_plane, vmap_state.plane,
                        vmap_state.plane_cov, vsizes, halves)
    return VoxelMap(*out)
