"""The LIO geometric map: multi-layer voxel plane statistics in HBM.

TPU-native re-design of VoxelMapManager + VoxelOctoTree (reference
include/voxel_map.h:129-257, src/voxel_map.cpp:55-335). The pointer-based
adaptive octree becomes L independent open-addressing hash layers (layer
l has voxel size v / 2^l). A voxel accumulates *running* plane statistics
in voxel-local coordinates:

    count, sum_p = Σ (p_i - voxel_center), sum_pp = Σ (p_i - c)(p_i - c)^T,
    sum_C = Σ C_i   (C_i = world covariance of point i)

from which mean / scatter covariance / plane fit are recovered exactly.
Local coordinates keep the Σpp^T - mean mean^T cancellation benign in
float32 (|p_local| <= voxel diagonal instead of absolute world position).

Storage is packed for op count, not elegance: all float statistics live
in one (C, 15) array and all plane parameters in (C, 8) + (C, 12), with
symmetric 3x3s as 6-vectors, so a probe/gather/scatter touches one array
(the map update was dominated by op dispatch across a dozen field arrays,
not bandwidth).

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


class MapLayer(NamedTuple):
    table: HashTable
    count: jnp.ndarray  # (C,) int32
    stats: jnp.ndarray  # (C, 15) running moments, voxel-local
    is_plane: jnp.ndarray  # (C,) bool
    plane: jnp.ndarray  # (C, 8) fitted plane params (world frame)
    plane_cov: jnp.ndarray  # (C, 12) plane parameter covariance


class VoxelMap(NamedTuple):
    layers: Sequence[MapLayer]  # tuple, layer 0 = coarsest


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


def make_layer(capacity: int) -> MapLayer:
    f = jnp.float32
    return MapLayer(
        table=voxel_hash.make_table(capacity),
        count=jnp.zeros(capacity, jnp.int32),
        stats=jnp.zeros((capacity, STATS_W), f),
        is_plane=jnp.zeros(capacity, bool),
        plane=jnp.zeros((capacity, PLANE_W), f),
        plane_cov=jnp.zeros((capacity, PCOV_W), f),
    )


def make_map(cfg: VoxelMapConfig) -> VoxelMap:
    cap = 1 << cfg.capacity_log2
    return VoxelMap(layers=tuple(make_layer(cap) for _ in range(cfg.n_layers)))


def layer_voxel_size(cfg: VoxelMapConfig, layer: int) -> float:
    return cfg.voxel_size / (1 << layer)


def _fit_planes(layer: MapLayer, slots: jnp.ndarray, cfg: VoxelMapConfig,
                layer_idx: int) -> MapLayer:
    """Batched plane refit for the (possibly duplicated) slot list of
    voxels touched this frame. Mirrors init_plane (voxel_map.cpp:55-135)
    with the closed-form plane covariance documented above."""
    vsize = layer_voxel_size(cfg, layer_idx)
    valid = slots >= 0
    s = jnp.where(valid, slots, 0)

    n = layer.count[s].astype(jnp.float32)
    n_safe = jnp.maximum(n, 1.0)
    st = layer.stats[s]  # (N, 15)
    mean_local = st[:, 0:3] / n_safe[:, None]
    cov6 = st[:, 3:9] / n_safe[:, None] - sym6(
        mean_local[:, :, None] * mean_local[:, None, :]
    )
    cov = sym6_to_mat(cov6) + jnp.eye(3) * 1e-9
    # Closed-form 3x3 eigensolver (ops/eig3): XLA's iterative eigh
    # dominated compile+run time for these (N, 3, 3) batches.
    evals, evecs = eig3.eigh3(cov)  # ascending
    lam0, lam1, lam2 = evals[:, 0], evals[:, 1], evals[:, 2]
    init_num = cfg.layer_init_num[min(layer_idx, len(cfg.layer_init_num) - 1)]
    enough = n > init_num
    is_plane = (lam0 < cfg.planner_threshold) & enough

    voxel_center = (layer.table.keys[s].astype(jnp.float32) + 0.5) * vsize
    center_w = voxel_center + mean_local

    normal = evecs[:, :, 0]
    d = -jnp.sum(normal * center_w, axis=-1)
    radius = jnp.sqrt(jnp.clip(lam2, 0.0, None))
    plane = jnp.concatenate(
        [normal, d[:, None], center_w, radius[:, None]], axis=-1
    )

    C_bar6 = st[:, 9:15] / n_safe[:, None]
    sigma2 = (C_bar6[:, 0] + C_bar6[:, 3] + C_bar6[:, 5]) / 3.0
    dmin = 1e-6
    d1 = (lam1 + lam0) / (n_safe * jnp.maximum((lam0 - lam1) ** 2, dmin))
    d2 = (lam2 + lam0) / (n_safe * jnp.maximum((lam0 - lam2) ** 2, dmin))
    D = jnp.zeros_like(evals).at[:, 1].set(d1).at[:, 2].set(d2)
    cov_nn = sigma2[:, None, None] * jnp.einsum("nik,nk,njk->nij", evecs, D, evecs)
    plane_cov = jnp.concatenate([sym6(cov_nn), C_bar6 / n_safe[:, None]], axis=-1)

    # Scatter plane fields back. Duplicate slots write identical values.
    w = jnp.where(valid & enough, s, layer.count.shape[0])
    return layer._replace(
        is_plane=layer.is_plane.at[w].set(is_plane, mode="drop"),
        plane=layer.plane.at[w].set(plane, mode="drop"),
        plane_cov=layer.plane_cov.at[w].set(plane_cov, mode="drop"),
    )


def update_layer(layer: MapLayer, pts_w: jnp.ndarray, var_w6: jnp.ndarray,
                 valid: jnp.ndarray, cfg: VoxelMapConfig, layer_idx: int) -> MapLayer:
    """Insert one frame's points into a layer and refit touched planes.
    Replaces UpdateOctoTree/init_plane (voxel_map.cpp:219-290) with
    scatter-adds + batched closed-form eigendecomposition. var_w6: point
    world covariances as sym6 (N, 6)."""
    vsize = layer_voxel_size(cfg, layer_idx)
    keys = voxel_hash.voxel_key(pts_w, vsize)
    table, slots = voxel_hash.lookup_or_insert(layer.table, keys, valid, cfg.probes)
    layer = layer._replace(table=table)

    ok = valid & (slots >= 0)
    s = jnp.where(ok, slots, 0)
    # Freeze full voxels (update_enable_ flip, voxel_map.cpp:240-245).
    frozen = layer.count[s] >= cfg.max_points_num
    ok = ok & ~frozen
    w = jnp.where(ok, slots, layer.count.shape[0])

    voxel_center = (keys.astype(jnp.float32) + 0.5) * vsize
    p_local = pts_w - voxel_center
    pp6 = sym6(p_local[:, :, None] * p_local[:, None, :])
    contrib = jnp.concatenate([p_local, pp6, var_w6], axis=-1)  # (N, 15)

    layer = layer._replace(
        count=layer.count.at[w].add(1, mode="drop"),
        stats=layer.stats.at[w].add(contrib, mode="drop"),
    )
    return _fit_planes(layer, jnp.where(ok, slots, -1), cfg, layer_idx)


def update_map(vmap_state: VoxelMap, pts_w: jnp.ndarray, var_w: jnp.ndarray,
               valid: jnp.ndarray, cfg: VoxelMapConfig) -> VoxelMap:
    """Insert a frame into every layer (the flat-layer equivalent of the
    octree's conditional subdivision — inactive layers are masked at
    query time, so unconditional accumulation changes no matches).
    var_w: (N, 3, 3) or (N, 6) sym6 point world covariances."""
    var_w6 = var_w if var_w.ndim == 2 else sym6(var_w)
    layers = tuple(
        update_layer(layer, pts_w, var_w6, valid, cfg, li)
        for li, layer in enumerate(vmap_state.layers)
    )
    return VoxelMap(layers=layers)


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


def _candidate(layer: MapLayer, keys, pts_w, var_w6, cfg: VoxelMapConfig):
    """Gate one layer's plane against the points. Returns per-point
    (exists, is_plane, gate_ok, prob, fields)."""
    slots = voxel_hash.lookup(layer.table, keys, cfg.probes)
    exists = slots >= 0
    s = jnp.where(exists, slots, 0)
    is_pl = layer.is_plane[s] & exists
    pl = layer.plane[s]  # (N, 8)
    pc = layer.plane_cov[s]  # (N, 12)
    n = pl[:, 0:3]
    d = pl[:, 3]
    c = pl[:, 4:7]
    radius = pl[:, 7]
    cov_nn6 = pc[:, 0:6]
    cov_qq6 = pc[:, 6:12]

    dist = jnp.sum(n * pts_w, axis=-1) + d
    a = pts_w - c
    dc2 = jnp.sum(a * a, axis=-1)
    range_dis2 = jnp.clip(dc2 - dist * dist, 0.0, None)
    in_radius = range_dis2 <= (3.0 * radius) ** 2  # radius_k=3 (:719)

    sigma_plane = quad6(cov_nn6, a) + quad6(cov_qq6, n)
    sigma_l = sigma_plane + quad6(var_w6, n)
    sigma_l = jnp.clip(sigma_l, 1e-12, None)
    gate = jnp.abs(dist) < cfg.sigma_num * jnp.sqrt(sigma_l)
    ok = is_pl & in_radius & gate
    prob = jnp.where(
        ok,
        jax.lax.rsqrt(sigma_l) * jnp.exp(-0.5 * dist * dist / sigma_l),
        -1.0,
    )
    return exists, is_pl, ok, prob, (n, d, c, dist, sigma_plane, cov_nn6, cov_qq6)


def match_planes(vmap_state: VoxelMap, pts_w: jnp.ndarray, var_w,
                 valid: jnp.ndarray, cfg: VoxelMapConfig) -> PlaneMatch:
    """Point-to-plane correspondence search (BuildResidualListOMP +
    build_single_residual, voxel_map.cpp:643-786) as fixed-shape batch ops.

    Per point we gate up to n_layers + 1 candidates: the containing voxel
    chain (layer l active iff its ancestors exist and are not planes) and
    the nearest neighbor root voxel, which is only considered when the own
    chain fails (:680-691). The max-probability candidate wins. Deviations
    from the reference, by design:
    - sibling sub-voxels are not searched (the reference recurses into all
      8 children; the containing chain covers the dominant match);
    - the neighbor shift uses the point's offset within its voxel in
      meters (the reference compares voxel-unit coordinates with
      meter-unit centers at :683-688, which we read as unintended).
    """
    var_w6 = var_w if var_w.ndim == 2 else sym6(var_w)
    n_pts = pts_w.shape[0]
    vsize0 = cfg.voxel_size
    keys0 = voxel_hash.voxel_key(pts_w, vsize0)

    # Nearest neighbor root voxel by in-voxel offset (quarter-length rule).
    center0 = (keys0.astype(jnp.float32) + 0.5) * vsize0
    off = pts_w - center0
    quarter = vsize0 / 4.0
    shift = jnp.where(off > quarter, 1, jnp.where(off < -quarter, -1, 0)).astype(jnp.int32)
    keys_nb = keys0 + shift

    cands = []
    ancestor_open = jnp.ones(n_pts, bool)
    for li, layer in enumerate(vmap_state.layers):
        vs = layer_voxel_size(cfg, li)
        keys_l = keys0 if li == 0 else voxel_hash.voxel_key(pts_w, vs)
        exists, is_pl, ok, prob, fields = _candidate(layer, keys_l, pts_w, var_w6, cfg)
        active = ancestor_open & ok
        cands.append((active, jnp.where(active, prob, -1.0), fields))
        ancestor_open = ancestor_open & exists & ~is_pl

    nb_root = _candidate(vmap_state.layers[0], keys_nb, pts_w, var_w6, cfg)
    any_own = jnp.zeros(n_pts, bool)
    for active, _, _ in cands:
        any_own = any_own | active
    nb_active = nb_root[2] & ~any_own
    nb_prob = jnp.where(nb_active, nb_root[3], -1.0)

    probs = jnp.stack([p for _, p, _ in cands] + [nb_prob], axis=0)  # (L+1, N)
    best = jnp.argmax(probs, axis=0)
    best_prob = jnp.max(probs, axis=0)
    any_valid = (best_prob > 0) & valid

    field_stacks = [f for _, _, f in cands] + [nb_root[4]]

    def take(i):
        arr = jnp.stack([f[i] for f in field_stacks], axis=0)
        idx = best.reshape((1, -1) + (1,) * (arr.ndim - 2))
        return jnp.take_along_axis(arr, idx, axis=0)[0]

    return PlaneMatch(
        valid=any_valid,
        normal=take(0),
        d=take(1),
        center=take(2),
        dist=take(3),
        sigma_plane=take(4),
        cov_nn=take(5),
        cov_qq=take(6),
    )


def query_plane(vmap_state: VoxelMap, pts_w: jnp.ndarray, cfg: VoxelMapConfig):
    """Ungated plane lookup along the containing chain: the first layer
    whose voxel is a fitted plane wins (VoxelOctoTree::find_correspond,
    voxel_map.cpp:292-305). Used by the VIO normal refinement
    (vio.cpp:981-1034). Returns (found, normal, d, center, radius,
    sigma_l) with sigma_l = a^T cov_nn a + n^T cov_qq n at pts_w."""
    n_pts = pts_w.shape[0]
    found = jnp.zeros(n_pts, bool)
    out_plane = jnp.zeros((n_pts, PLANE_W))
    out_sigma = jnp.zeros(n_pts)
    open_chain = jnp.ones(n_pts, bool)
    for li, layer in enumerate(vmap_state.layers):
        vs = layer_voxel_size(cfg, li)
        keys = voxel_hash.voxel_key(pts_w, vs)
        slots = voxel_hash.lookup(layer.table, keys, cfg.probes)
        exists = slots >= 0
        s = jnp.where(exists, slots, 0)
        is_pl = layer.is_plane[s] & exists
        hit = open_chain & is_pl
        pl = layer.plane[s]
        pc = layer.plane_cov[s]
        a = pts_w - pl[:, 4:7]
        n = pl[:, 0:3]
        sigma = quad6(pc[:, 0:6], a) + quad6(pc[:, 6:12], n)
        out_plane = jnp.where(hit[:, None], pl, out_plane)
        out_sigma = jnp.where(hit, sigma, out_sigma)
        found = found | hit
        open_chain = open_chain & exists & ~is_pl
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
    new_layers = []
    for li, layer in enumerate(vmap_state.layers):
        vs = layer_voxel_size(cfg, li)
        cap = layer.count.shape[0]
        scale = 1 << li
        ctr = jnp.floor(center_pos / vs).astype(jnp.int32)
        half = half_map_size * scale
        occupied = layer.table.keys[:, 0] != voxel_hash.EMPTY
        keep = occupied & jnp.all(jnp.abs(layer.table.keys - ctr) <= half, axis=-1)
        fresh = voxel_hash.make_table(cap)
        fresh, new_slots = voxel_hash.lookup_or_insert(
            fresh, layer.table.keys, keep, cfg.probes
        )
        dst = jnp.where(keep & (new_slots >= 0), new_slots, cap)

        def move(arr):
            return jnp.zeros_like(arr).at[dst].set(arr, mode="drop")

        new_layers.append(MapLayer(
            table=fresh,
            count=move(layer.count),
            stats=move(layer.stats),
            is_plane=move(layer.is_plane),
            plane=move(layer.plane),
            plane_cov=move(layer.plane_cov),
        ))
    return VoxelMap(layers=tuple(new_layers))
