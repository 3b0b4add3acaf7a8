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
3x3 eigh over touched voxels. σ_l gating then reads
    σ_l = a^T cov(n) a + n^T cov(q) n,   a = p_w - center
matching J_nq = [p_w - center, -n] of the reference (:732-736).
"""

from functools import partial
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from ..ops import eig3, voxel_hash
from ..ops.voxel_hash import HashTable


class MapLayer(NamedTuple):
    table: HashTable
    count: jnp.ndarray  # (C,) int32
    sum_p: jnp.ndarray  # (C, 3) voxel-local Σ(p - center)
    sum_pp: jnp.ndarray  # (C, 3, 3)
    sum_C: jnp.ndarray  # (C, 3, 3) Σ point world-covariances
    # Fitted plane (valid iff is_plane):
    is_plane: jnp.ndarray  # (C,) bool
    normal: jnp.ndarray  # (C, 3)
    d: jnp.ndarray  # (C,) plane offset: n·p + d = 0
    center: jnp.ndarray  # (C, 3) world mean of member points
    radius: jnp.ndarray  # (C,) sqrt(max eigenvalue)
    cov_nn: jnp.ndarray  # (C, 3, 3) normal covariance
    cov_qq: jnp.ndarray  # (C, 3, 3) center covariance


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
        sum_p=jnp.zeros((capacity, 3), f),
        sum_pp=jnp.zeros((capacity, 3, 3), f),
        sum_C=jnp.zeros((capacity, 3, 3), f),
        is_plane=jnp.zeros(capacity, bool),
        normal=jnp.zeros((capacity, 3), f),
        d=jnp.zeros(capacity, f),
        center=jnp.zeros((capacity, 3), f),
        radius=jnp.zeros(capacity, f),
        cov_nn=jnp.zeros((capacity, 3, 3), f),
        cov_qq=jnp.zeros((capacity, 3, 3), f),
    )


def make_map(cfg: VoxelMapConfig) -> VoxelMap:
    cap = 1 << cfg.capacity_log2
    return VoxelMap(layers=tuple(make_layer(cap) for _ in range(cfg.n_layers)))


def layer_voxel_size(cfg: VoxelMapConfig, layer: int) -> float:
    return cfg.voxel_size / (1 << layer)


def _sym(m):
    return 0.5 * (m + jnp.swapaxes(m, -1, -2))


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
    mean_local = layer.sum_p[s] / n_safe[:, None]
    cov = layer.sum_pp[s] / n_safe[:, None, None] - mean_local[:, :, None] * mean_local[:, None, :]
    cov = _sym(cov) + jnp.eye(3) * 1e-9
    # Closed-form 3x3 eigensolver (ops/eig3): XLA's iterative eigh
    # dominated compile+run time for these (N, 3, 3) batches.
    evals, evecs = eig3.eigh3(cov)  # ascending
    lam0, lam1, lam2 = evals[:, 0], evals[:, 1], evals[:, 2]
    init_num = cfg.layer_init_num[min(layer_idx, len(cfg.layer_init_num) - 1)]
    enough = n > init_num
    is_plane = (lam0 < cfg.planner_threshold) & enough

    # Voxel world center from any member point's key is not stored; the
    # plane center is reconstructed from the local mean + slot's voxel
    # center, which we recover from the stored key.
    kx = layer.table.kx[s].astype(jnp.float32)
    ky = layer.table.ky[s].astype(jnp.float32)
    kz = layer.table.kz[s].astype(jnp.float32)
    voxel_center = (jnp.stack([kx, ky, kz], axis=-1) + 0.5) * vsize
    center_w = voxel_center + mean_local

    normal = evecs[:, :, 0]
    d = -jnp.sum(normal * center_w, axis=-1)
    radius = jnp.sqrt(jnp.clip(lam2, 0.0, None))

    C_bar = layer.sum_C[s] / n_safe[:, None, None]
    sigma2 = jnp.trace(C_bar, axis1=-2, axis2=-1) / 3.0
    dmin = 1e-6
    d1 = (lam1 + lam0) / (n_safe * jnp.maximum((lam0 - lam1) ** 2, dmin))
    d2 = (lam2 + lam0) / (n_safe * jnp.maximum((lam0 - lam2) ** 2, dmin))
    D = jnp.zeros_like(evals).at[:, 1].set(d1).at[:, 2].set(d2)
    cov_nn = sigma2[:, None, None] * jnp.einsum("nik,nk,njk->nij", evecs, D, evecs)
    cov_qq = C_bar / n_safe[:, None, None]

    # Scatter plane fields back. Duplicate slots write identical values.
    w = jnp.where(valid & enough, s, layer.count.shape[0])
    layer = layer._replace(
        is_plane=layer.is_plane.at[w].set(is_plane, mode="drop"),
        normal=layer.normal.at[w].set(normal, mode="drop"),
        d=layer.d.at[w].set(d, mode="drop"),
        center=layer.center.at[w].set(center_w, mode="drop"),
        radius=layer.radius.at[w].set(radius, mode="drop"),
        cov_nn=layer.cov_nn.at[w].set(cov_nn, mode="drop"),
        cov_qq=layer.cov_qq.at[w].set(cov_qq, mode="drop"),
    )
    return layer


def update_layer(layer: MapLayer, pts_w: jnp.ndarray, var_w: jnp.ndarray,
                 valid: jnp.ndarray, cfg: VoxelMapConfig, layer_idx: int) -> MapLayer:
    """Insert one frame's points into a layer and refit touched planes.
    Replaces UpdateOctoTree/init_plane (voxel_map.cpp:219-290) with
    scatter-adds + batched eigh."""
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
    pp = p_local[:, :, None] * p_local[:, None, :]

    layer = layer._replace(
        count=layer.count.at[w].add(1, mode="drop"),
        sum_p=layer.sum_p.at[w].add(p_local, mode="drop"),
        sum_pp=layer.sum_pp.at[w].add(pp, mode="drop"),
        sum_C=layer.sum_C.at[w].add(var_w, mode="drop"),
    )
    return _fit_planes(layer, jnp.where(ok, slots, -1), cfg, layer_idx)


def update_map(vmap_state: VoxelMap, pts_w: jnp.ndarray, var_w: jnp.ndarray,
               valid: jnp.ndarray, cfg: VoxelMapConfig) -> VoxelMap:
    """Insert a frame into every layer (the flat-layer equivalent of the
    octree's conditional subdivision — inactive layers are masked at
    query time, so unconditional accumulation changes no matches)."""
    layers = tuple(
        update_layer(layer, pts_w, var_w, valid, cfg, li)
        for li, layer in enumerate(vmap_state.layers)
    )
    return VoxelMap(layers=layers)


class PlaneMatch(NamedTuple):
    """Per-point plane correspondence (the PointToPlane record of
    voxel_map.h + probability-selected match of voxel_map.cpp:713-767)."""

    valid: jnp.ndarray  # (N,) bool
    normal: jnp.ndarray  # (N, 3)
    d: jnp.ndarray  # (N,)
    center: jnp.ndarray  # (N, 3)
    dist: jnp.ndarray  # (N,) signed point-to-plane distance
    sigma_plane: jnp.ndarray  # (N,) a^T cov_nn a + n^T cov_qq n
    cov_nn: jnp.ndarray  # (N, 3, 3) matched plane normal covariance
    cov_qq: jnp.ndarray  # (N, 3, 3) matched plane center covariance


def _candidate(layer: MapLayer, keys, pts_w, var_w, cfg: VoxelMapConfig):
    """Gate one layer's plane against the points. Returns per-point
    (exists, is_plane, gate_ok, prob, match fields)."""
    slots = voxel_hash.lookup(layer.table, keys, cfg.probes)
    exists = slots >= 0
    s = jnp.where(exists, slots, 0)
    is_pl = layer.is_plane[s] & exists
    n = layer.normal[s]
    d = layer.d[s]
    c = layer.center[s]
    radius = layer.radius[s]
    cov_nn = layer.cov_nn[s]
    cov_qq = layer.cov_qq[s]

    dist = jnp.sum(n * pts_w, axis=-1) + d
    a = pts_w - c
    dc2 = jnp.sum(a * a, axis=-1)
    range_dis2 = jnp.clip(dc2 - dist * dist, 0.0, None)
    in_radius = range_dis2 <= (3.0 * radius) ** 2  # radius_k=3 (:719)

    sigma_plane = (
        jnp.einsum("ni,nij,nj->n", a, cov_nn, a)
        + jnp.einsum("ni,nij,nj->n", n, cov_qq, n)
    )
    sigma_l = sigma_plane + jnp.einsum("ni,nij,nj->n", n, var_w, n)
    sigma_l = jnp.clip(sigma_l, 1e-12, None)
    gate = jnp.abs(dist) < cfg.sigma_num * jnp.sqrt(sigma_l)
    ok = is_pl & in_radius & gate
    prob = jnp.where(
        ok,
        jax.lax.rsqrt(sigma_l) * jnp.exp(-0.5 * dist * dist / sigma_l),
        -1.0,
    )
    return exists, is_pl, ok, prob, (n, d, c, dist, sigma_plane, cov_nn, cov_qq)


def match_planes(vmap_state: VoxelMap, pts_w: jnp.ndarray, var_w: jnp.ndarray,
                 valid: jnp.ndarray, cfg: VoxelMapConfig) -> PlaneMatch:
    """Point-to-plane correspondence search (BuildResidualListOMP +
    build_single_residual, voxel_map.cpp:643-786) as fixed-shape batch ops.

    Per point we gate up to 2 * n_layers candidates: the containing voxel
    chain (layer l active iff its ancestors exist and are not planes) and
    the same chain in the nearest neighbor root voxel, which is only
    considered when the own chain fails (:680-691). The max-probability
    candidate wins. Deviations from the reference, by design:
    - sibling sub-voxels are not searched (the reference recurses into all
      8 children; the containing chain covers the dominant match);
    - the neighbor shift uses the point's offset within its voxel in
      meters (the reference compares voxel-unit coordinates with
      meter-unit centers at :683-688, which we read as unintended).
    """
    n_pts = pts_w.shape[0]
    vsize0 = cfg.voxel_size
    keys0 = voxel_hash.voxel_key(pts_w, vsize0)

    # Nearest neighbor root voxel by in-voxel offset (quarter-length rule).
    center0 = (keys0.astype(jnp.float32) + 0.5) * vsize0
    off = pts_w - center0
    quarter = vsize0 / 4.0
    shift = jnp.where(off > quarter, 1, jnp.where(off < -quarter, -1, 0)).astype(jnp.int32)
    keys_nb = keys0 + shift

    def chain(root_keys):
        """Candidates along one root's containing chain."""
        cands = []
        ancestor_open = jnp.ones(n_pts, bool)  # ancestors exist & are not planes
        root_exists = None
        for li, layer in enumerate(vmap_state.layers):
            vs = layer_voxel_size(cfg, li)
            keys_l = voxel_hash.voxel_key(pts_w, vs) if li > 0 else root_keys
            exists, is_pl, ok, prob, fields = _candidate(layer, keys_l, pts_w, var_w, cfg)
            if li == 0:
                root_exists = exists
            active = ancestor_open & ok
            cands.append((active, jnp.where(active, prob, -1.0), fields))
            ancestor_open = ancestor_open & exists & ~is_pl
        return cands, root_exists

    # Own chain. For the neighbor chain the sub-voxel keys must be derived
    # from the *shifted* root, i.e. the point's key computed in the
    # neighbor root's frame — geometrically the point still hashes to its
    # own sub-voxel; the reference looks up the neighbor's octree with the
    # point's world position, so sub-voxel keys are the neighbor root's
    # children that contain the point — which only exist if the point's
    # own sub-voxel lies inside the neighbor root. Matching that exactly:
    # the sub-voxel key of the point inside the neighbor root is just the
    # point's own sub-voxel key; it belongs to the neighbor root only if
    # floor-division maps it there, which it does not. Net effect: the
    # neighbor fallback can only match the neighbor's *root* plane.
    own, _ = chain(keys0)
    nb_root = _candidate(vmap_state.layers[0], keys_nb, pts_w, var_w, cfg)
    nb_active = nb_root[2]
    nb_prob = jnp.where(nb_active, nb_root[3], -1.0)

    any_own = jnp.zeros(n_pts, bool)
    for active, _, _ in own:
        any_own = any_own | active
    nb_prob = jnp.where(any_own, -1.0, nb_prob)
    nb_active = nb_active & ~any_own

    probs = jnp.stack([p for _, p, _ in own] + [nb_prob], axis=0)  # (L+1, N)
    best = jnp.argmax(probs, axis=0)
    best_prob = jnp.max(probs, axis=0)
    any_valid = (best_prob > 0) & valid

    field_stacks = [f for _, _, f in own] + [nb_root[4]]

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
    out = {
        "normal": jnp.zeros((n_pts, 3)),
        "d": jnp.zeros(n_pts),
        "center": jnp.zeros((n_pts, 3)),
        "radius": jnp.zeros(n_pts),
        "sigma": jnp.zeros(n_pts),
    }
    open_chain = jnp.ones(n_pts, bool)
    for li, layer in enumerate(vmap_state.layers):
        vs = layer_voxel_size(cfg, li)
        keys = voxel_hash.voxel_key(pts_w, vs)
        slots = voxel_hash.lookup(layer.table, keys, cfg.probes)
        exists = slots >= 0
        s = jnp.where(exists, slots, 0)
        is_pl = layer.is_plane[s] & exists
        hit = open_chain & is_pl
        a = pts_w - layer.center[s]
        n = layer.normal[s]
        sigma = (
            jnp.einsum("ni,nij,nj->n", a, layer.cov_nn[s], a)
            + jnp.einsum("ni,nij,nj->n", n, layer.cov_qq[s], n)
        )
        out["normal"] = jnp.where(hit[:, None], n, out["normal"])
        out["d"] = jnp.where(hit, layer.d[s], out["d"])
        out["center"] = jnp.where(hit[:, None], layer.center[s], out["center"])
        out["radius"] = jnp.where(hit, layer.radius[s], out["radius"])
        out["sigma"] = jnp.where(hit, sigma, out["sigma"])
        found = found | hit
        open_chain = open_chain & exists & ~is_pl
    return found, out["normal"], out["d"], out["center"], out["radius"], out["sigma"]


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
        # box limits in this layer's voxel units, scaled from root units
        scale = 1 << li
        ctr = jnp.floor(center_pos / vs).astype(jnp.int32)
        half = half_map_size * scale
        occupied = layer.table.kx != voxel_hash.EMPTY
        keep = (
            occupied
            & (jnp.abs(layer.table.kx - ctr[0]) <= half)
            & (jnp.abs(layer.table.ky - ctr[1]) <= half)
            & (jnp.abs(layer.table.kz - ctr[2]) <= half)
        )
        keys = jnp.stack([layer.table.kx, layer.table.ky, layer.table.kz], axis=-1)
        fresh = voxel_hash.make_table(cap)
        fresh, new_slots = voxel_hash.lookup_or_insert(fresh, keys, keep, cfg.probes)
        # scatter value rows old-slot -> new-slot
        dst = jnp.where(keep & (new_slots >= 0), new_slots, cap)

        def move(arr, fill=0.0):
            out = jnp.zeros_like(arr)
            if arr.dtype == bool:
                out = jnp.zeros_like(arr)
            return out.at[dst].set(arr, mode="drop")

        new_layers.append(MapLayer(
            table=fresh,
            count=move(layer.count),
            sum_p=move(layer.sum_p),
            sum_pp=move(layer.sum_pp),
            sum_C=move(layer.sum_C),
            is_plane=move(layer.is_plane),
            normal=move(layer.normal),
            d=move(layer.d),
            center=move(layer.center),
            radius=move(layer.radius),
            cov_nn=move(layer.cov_nn),
            cov_qq=move(layer.cov_qq),
        ))
    return VoxelMap(layers=tuple(new_layers))
