"""The LIO geometric map: multi-layer voxel plane statistics in HBM.

TPU-native re-design of VoxelMapManager + VoxelOctoTree (reference
include/voxel_map.h:129-257, src/voxel_map.cpp:55-335). The pointer-based
adaptive octree becomes L stacked open-addressing hash layers (layer l
has voxel size v / 2^l), all carried with a leading layer axis and
processed with one vmapped op set per frame.

TPU storage design (r5 "rec-free" restructure). The map state is ONLY
the raw running moments:

- `keys (L, C, 3)` int32 open-addressing keys: linear probing makes the
  probe window contiguous, so a lookup gathers rows h..h+P-1 in ONE
  windowed gather (N, P, 3) and resolves the chain in registers;
- `stats (L, C, 16)` = [count | sum_p | sum_pp sym6 | sum_C sym6]
  (voxel-local coordinates, so the Σpp^T - mean mean^T cancellation is
  benign in float32).

Earlier rounds ALSO materialized a per-voxel plane record `rec (C, 22)`
(normal/d/center/radius/plane-cov/topology), refit by every insert with
a batched eigendecomposition and a full-row scatter. Chained-slope
measurement on the chip (scripts/micro_scatter.py / micro_derive.py, r5)
showed that trade is upside down on this hardware: random-row SCATTERS
cost ~80 ns/row while the entire plane derivation (closed-form 3x3 eig
included) costs < 3 ns/lane in registers — the refit pipeline
(stats read-back + eig + 22-wide rec scatter) was ~70 % of the insert's
device time and bought nothing a read-time derivation doesn't. So:

- INSERT is lookup + claim + ONE 16-wide scatter-add per layer
  (no read-after-write, no second scatter);
- every READER (match_planes / query_plane / tools) derives the plane
  record from the gathered stats row in registers via
  `_derive_from_stats` — the exact math the old refit ran, at the same
  numerical values (same moments -> same record), always fresh.

The reference's octree semantics map onto layer masks:
- a layer-l voxel is *active* for matching iff it is a fitted plane AND
  its ancestors at layers < l exist but failed the plane test
  (voxel_map.cpp:137-161 init/cut, :292-305 find_correspond);
- voxels freeze (stop accumulating) once count >= max_points_num
  (:146-151, :240-245) — their stats rows stop changing, so the derived
  plane freezes with them (identical to the old frozen rec);
- the sticky CUT state (octo_state_=1, opt-in `sticky_cut`) is the one
  history-dependent bit a derivation cannot reconstruct from moments —
  it is encoded in-band as `count + CUT_MARK` (an idempotent 1-wide
  scatter-max on the transition frame; cut voxels never accumulate or
  serve matches afterwards, so the frozen moments never disagree with
  the marked count).

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

so the per-voxel state stays O(1) and σ_l gating reads
σ_l = a^T cov(n) a + n^T cov(q) n, a = p_w - center, matching
J_nq = [p_w - center, -n] of the reference (:732-736).
"""

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from ..ops import eig3, voxel_hash

EMPTY = voxel_hash.EMPTY

# Derived plane-record layout (the read-time register record; column
# constants shared by _gate and the tools that consume derive_rec):
_ISPL = 0                # plane/topology state, one float column:
#   1.0  solid fitted plane (serves matches; chain stops here)
#   0.75 MARGINAL fitted plane: lam0 within pre_descend_margin of the
#        threshold — still a plane for matching (> 0.5), but children
#        pre-accumulate stats so that if this voxel later demotes, its
#        sub-planes are ready immediately. This stands in for the
#        reference's cut_octo_tree point seeding (voxel_map.cpp:163-217
#        pushes the parent's accumulated points into the children at cut
#        time; we never store member points, so we warm the children up
#        front instead).
#   0.0  undecided (not enough points, or enough-but-unplanar at the
#        last layer, which keeps accumulating like the reference's
#        max_layer node, voxel_map.cpp:271-287)
#  -1.0  CUT: permanently an internal node (reference octo_state_=1 —
#        a node that failed the plane test with enough points never
#        refits, never serves matches, and routes points to children,
#        voxel_map.cpp:219-268). Sticky: encoded as count >= CUT_MARK;
#        stats stop accumulating. r4's non-sticky refit let a gently
#        curved voxel oscillate back to is_plane and mask its children
#        with a biased coarse fit — measured WORSE than the flat-layer
#        refit (see VoxelMapConfig.sticky_cut), so sticky is opt-in.
_PL0, _PL1 = 1, 9        # plane: normal(3), d, center(3), radius
_PC0, _PC1 = 9, 21       # plane_cov: cov_nn sym6, cov_qq sym6
_CNT = 21                # point count (mark-stripped)
REC_W = 22
STATS_W = 16  # [count | sum_p(3) | sum_pp sym6 | sum_C sym6]

CUT_MARK = 8388608.0  # 2^23: exact in f32; count + mark stays exact
# (counts are bounded by max_points_num + one frame's batch << 2^23)


def sym6(m):
    """(..., 3, 3) symmetric -> (..., 6) as (xx, xy, xz, yy, yz, zz)."""
    return jnp.stack(
        [m[..., 0, 0], m[..., 0, 1], m[..., 0, 2],
         m[..., 1, 1], m[..., 1, 2], m[..., 2, 2]], axis=-1,
    )


def sym6_to_mat(s):
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
    """v^T M v for sym6 M (..., 6) and vectors v (..., 3)."""
    vx, vy, vz = v[..., 0], v[..., 1], v[..., 2]
    return (
        s[..., 0] * vx * vx + s[..., 3] * vy * vy + s[..., 5] * vz * vz
        + 2.0 * (s[..., 1] * vx * vy + s[..., 2] * vx * vz + s[..., 4] * vy * vz)
    )


class VoxelMap(NamedTuple):
    keys: jnp.ndarray  # (L, C, 3) int32, EMPTY-marked free slots
    stats: jnp.ndarray  # (L, C, 16) [count | running moments]
    rec: jnp.ndarray  # (L, C, 22) derived plane-record CACHE — a pure
    # function of (keys, stats), refreshed by ONE full-table streaming
    # derivation at the end of every mutation (update_map / slide_map),
    # never by per-lane scatters. Readers gather it like any table; the
    # invariant is rec == derive_rec(keys, stats) at every API boundary.
    # Measured (scripts/micro_match.py): the full-table stream costs
    # 0.78 ms at L=3, C=2^18 — vs ~1.1 ms EXTRA per match call when the
    # record is derived in registers behind every gather (the derive
    # math is free, but re-deriving inside the LIO while_loop roughly
    # doubled the op chain per iteration), and vs ~4 ms/insert for the
    # r4 per-lane refit scatters this cache replaces.


class VoxelMapConfig(NamedTuple):
    """Static (compile-time) map configuration."""

    voxel_size: float = 0.5
    n_layers: int = 3  # reference max_layer=2 -> layers 0..2
    capacity_log2: int = 18
    probes: int = 8
    insert_compact: int = 0  # >0: compact unresolved keys to this many
    # lanes before the claim rounds (steady-state insert fast path)
    descend_compact: int = 0  # >0: steady-state inserts process layers
    # >= 1 only for points whose layer-0 voxel failed the plane test,
    # compacted to this many lanes (the octree only subdivides non-planar
    # voxels, so descending points are a small fraction; random-access
    # cost is per-row, so compaction cuts the fine layers' scatter
    # traffic ~(N/descend_compact)x). Overflow lanes skip the fine layers
    # this frame.
    planner_threshold: float = 0.0025  # min_eigen_value
    sigma_num: float = 3.0
    sticky_cut: bool = False  # True = the reference octree's topology:
    # a voxel with children that fails the plane test with enough points
    # becomes a permanent internal node (octo_state_=1,
    # voxel_map.cpp:219-268) — stops accumulating, never refits, its
    # children serve all matches. MEASURED (r5, scripts/diag_map.py
    # outdoor 2 m sweep): sticky cut is 2x WORSE than the per-frame
    # refit it replaces (ATE 3.22 vs 1.55 m) — permanently deleting a
    # coarse constraint while its children are still sparse starves the
    # filter exactly when it is converging attitude. The flat-layer
    # refit keeps the coarse plane alive alongside the children, which
    # measures strictly better, so the faithful topology is opt-in.
    pre_descend_margin: float = 0.5  # fitted planes with
    # lam0 > margin * planner_threshold are MARGINAL: children
    # pre-accumulate behind them (see _ISPL legend). 1.0 disables
    # (only failed/cut voxels descend, the r4 behavior); 0.0 descends
    # behind EVERY plane (full multi-resolution accumulation).
    match_finest: bool = False  # match_planes picks the DEEPEST gated
    # plane along the containing chain instead of the reference's
    # first-plane-in-chain semantics (find_correspond,
    # voxel_map.cpp:292-305). MEASURED (r5, outdoor 2 m sweep,
    # scripts/diag_map.py): WORSE than coarse-first (2.2-5.5 vs 1.55 m
    # ATE) — few-point fine planes of marginally-planar geometry are
    # noisier constraints than the mature coarse fit. Kept as the
    # documented negative result + unit-tested A/B knob; the measured
    # fix for the large-voxel gap is lio_plane_info_cap (see
    # core/lio.py: the gap's mechanism was correlated residuals sharing
    # one plane's fit error, not match resolution).
    layer_init_num: Sequence[int] = (5, 5, 5, 5, 5)
    max_points_num: int = 50
    sibling_search: bool = False  # match_planes also gates the nearest
    # SIBLING sub-voxel at each layer >= 1 (the reference recurses into
    # all 8 children of a non-plane node, voxel_map.cpp:713-786; the
    # quarter-rule nearest sibling covers the boundary-point case at one
    # extra gather per fine layer instead of 8). Default OFF: measured on
    # the hard non-planar benchmark it changes nothing at the default
    # planner threshold (ATE 0.0097 either way, 260 subdivided voxels)
    # and is marginally WORSE with subdivision forced at threshold
    # 0.0005 (0.0174 vs 0.0166) — the containing chain already carries
    # the dominant match, so the extra per-layer gather buys no accuracy.


def make_map(cfg: VoxelMapConfig) -> VoxelMap:
    L, C = cfg.n_layers, 1 << cfg.capacity_log2
    return VoxelMap(
        keys=jnp.full((L, C, 3), EMPTY, jnp.int32),
        stats=jnp.zeros((L, C, STATS_W), jnp.float32),
        rec=jnp.zeros((L, C, REC_W), jnp.float32),
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


def layer_has_kids(cfg: VoxelMapConfig) -> jnp.ndarray:
    return jnp.asarray(
        [1.0 if l < cfg.n_layers - 1 else 0.0 for l in range(cfg.n_layers)],
        jnp.float32)


def _bucket(keys, capacity):
    return voxel_hash._bucket(keys, capacity)


def _lookup_window(keys_tab, keys, probes: int, claim_rounds: int = None):
    """ONE windowed gather resolving a whole probe chain.

    keys_tab: (C, 3) int32; keys: (N, 3) int32. Returns (slot (N,),
    found (N,), empty_rows (N, R)); slot is -1 when absent; empty_rows
    are the first R EMPTY rows of the probe window (-1-padded) — the only
    rows an insert of this key may claim, since lookups stop at the first
    EMPTY."""
    C = keys_tab.shape[0]
    h = _bucket(keys, C)
    offs = jnp.arange(probes, dtype=jnp.int32)
    rows = jnp.bitwise_and(h[:, None] + offs[None, :], C - 1)  # (N, P)
    wkeys = keys_tab[rows]  # (N, P, 3) — the single gather
    match = jnp.all(wkeys == keys[:, None, :], axis=-1)  # (N, P)
    is_empty = wkeys[:, :, 0] == EMPTY
    empty_before = jnp.cumsum(is_empty.astype(jnp.int32), axis=1) > 0
    valid_match = match & ~jnp.roll(empty_before, 1, axis=1).at[:, 0].set(False)
    found = jnp.any(valid_match, axis=1)
    j = jnp.argmax(valid_match, axis=1)
    slot = jnp.where(found, jnp.take_along_axis(rows, j[:, None], axis=1)[:, 0], -1)
    if claim_rounds is None:
        claim_rounds = _CLAIM_ROUNDS
    empty_rows = []
    rem = is_empty
    for _ in range(min(claim_rounds, probes)):
        any_e = jnp.any(rem, axis=1)
        je = jnp.argmax(rem, axis=1)
        empty_rows.append(jnp.where(
            any_e, jnp.take_along_axis(rows, je[:, None], axis=1)[:, 0], -1
        ))
        rem = rem & (jnp.arange(rem.shape[1])[None, :] != je[:, None])
    empty_rows = jnp.stack(empty_rows, axis=1)  # (N, R)
    return slot, found, empty_rows


def _compact_lanes(mask, size: int):
    """Indices of the first `size` True lanes (ascending), n-filled —
    the jnp.nonzero(mask, size=, fill_value=n) contract, computed as
    cumsum + one 1-wide scatter. nonzero's size= path lowers to a sort
    on TPU (measured ~10x this cost at 8k lanes); the cumsum keeps the
    same ascending-lane order the claim protocol relies on."""
    n = mask.shape[0]
    pos = jnp.cumsum(mask.astype(jnp.int32)) - 1
    dst = jnp.where(mask & (pos < size), pos, size)
    return jnp.full((size,), n, jnp.int32).at[dst].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")


_CLAIM_ROUNDS = 3  # snapshot-empty claim rounds per insert (losing keys
# re-insert on the next frame that observes the voxel; 2 rounds measured
# only ~0.7 ms cheaper and pushed single-shot insert drops past 2%)


def _claim_rounds(keys_tab, keys, targets, unresolved):
    """Race-free claim over the lookup-snapshot empties, restructured
    (r5) to 2 random-access ops per round + ONE deferred key write.

    A PERSISTENT per-row claims table carries the winning priority
    ticket across rounds; round k's ticket is (R - k) * n + lane, so an
    earlier round's winner always outranks any later bid (a claimed row
    can never be stolen). Per round each candidate lane (1) scatter-max
    bids its ticket on its k-th snapshot-empty window row and (2)
    gathers the row's winning ticket back. The winner's LANE is
    ticket % n, so a single batch-local key compare resolves winners
    AND duplicate-key lanes (a twin that lost to its own key's winner)
    without re-reading keys_tab — the serializing read-after-write
    chain of the r1-r4 protocol (still-empty gather, key write, verify
    gather per round: ~5 ops/round) is gone. Keys are written once at
    the end: every resolved lane scatter-sets its key to its slot
    (duplicates write identical values — idempotent).

    The lookup invariant (probes stop at the first EMPTY row) is
    preserved exactly as before: a lane only advances to its k-th empty
    after losing its earlier ones, and losing a row implies another
    lane won it — and every scatter-max winner necessarily resolves
    (its own twin check passes) and writes the row this frame. Lanes
    that lose every round stay -1 and re-insert on the next frame that
    observes the voxel. Returns (keys_tab, slot (N,) or -1)."""
    C = keys_tab.shape[0]
    n = keys.shape[0]
    R = targets.shape[1]
    lane = jnp.arange(n, dtype=jnp.int32)
    slot_out = jnp.full((n,), -1, jnp.int32)
    claims = jnp.full((C,), -1, jnp.int32)
    for k in range(R):
        target = targets[:, k]
        cand = unresolved & (target >= 0)
        s = jnp.where(cand, target, C)
        ticket = jnp.int32((R - k) * n) + lane
        claims = claims.at[s].max(jnp.where(cand, ticket, -1), mode="drop")
        row_ticket = claims[jnp.where(cand, target, 0)]
        win_lane = jnp.where(row_ticket >= 0, row_ticket % n, 0)
        resolved = cand & (row_ticket >= 0) & jnp.all(
            keys[win_lane] == keys, axis=-1)
        slot_out = jnp.where(resolved, target, slot_out)
        unresolved = unresolved & ~resolved
    keys_tab = keys_tab.at[
        jnp.where(slot_out >= 0, slot_out, C)
    ].set(keys, mode="drop")
    return keys_tab, slot_out


def _insert(keys_tab, keys, valid, probes: int, compact_to: int = 0,
            claim_rounds: int = None):
    """Find-or-claim slots. Hits resolve in ONE windowed lookup; new keys
    claim the EMPTY rows their probe window already exposed during that
    lookup (so claiming costs ~3 random-access ops per round instead of a
    fresh probe walk). With compact_to > 0 the unresolved lanes are first
    compacted into that many lanes (at a steady frame new keys are a few
    percent of the batch). Overflowing/losing keys are dropped this
    frame — they re-insert on the next frame that observes the voxel.
    Returns (keys_tab, slot (N,), -1 = absent)."""
    n = keys.shape[0]
    slot_out = jnp.full((n,), -1, jnp.int32)

    # Fast path: one windowed lookup resolves existing keys.
    slot0, found0, empty_rows = _lookup_window(keys_tab, keys, probes,
                                               claim_rounds)
    slot_out = jnp.where(found0, slot0, slot_out)
    unresolved = valid & ~found0 & (empty_rows[:, 0] >= 0)

    if compact_to and compact_to < n:
        u = compact_to
        lane_idx = _compact_lanes(unresolved, u)
        li = jnp.minimum(lane_idx, n - 1)
        cu = lane_idx < n
        keys_tab, cslot = _claim_rounds(keys_tab, keys[li], empty_rows[li], cu)
        slot_out = slot_out.at[jnp.where(cu, lane_idx, n)].set(
            cslot, mode="drop"
        )
    else:
        keys_tab, cslot = _claim_rounds(keys_tab, keys, empty_rows, unresolved)
        slot_out = jnp.where(unresolved, cslot, slot_out)
    return keys_tab, slot_out


def _claim_compacted(keys_tab, keys, targets, unres, compact_to: int):
    """Claim rounds with optional lane compaction (the steady-state insert
    fast path: new keys are a few percent of the batch). Returns
    (keys_tab, slot_add (N,) with -1 for unclaimed)."""
    N = keys.shape[0]
    if compact_to and compact_to < N:
        u = compact_to
        lane_idx = _compact_lanes(unres, u)
        li = jnp.minimum(lane_idx, N - 1)
        cu = lane_idx < N
        keys_tab, cslot = _claim_rounds(keys_tab, keys[li], targets[li], cu)
        slot_add = jnp.full((N,), -1, jnp.int32).at[
            jnp.where(cu, lane_idx, N)
        ].set(cslot, mode="drop")
    else:
        keys_tab, slot_add = _claim_rounds(keys_tab, keys, targets, unres)
    return keys_tab, slot_add


def _derive_from_stats(st16, keys, vsize, init_num, has_kids,
                       cfg: VoxelMapConfig):
    """Plane record from a raw moments row (the math the r4 rec refit
    ran per insert — init_plane, voxel_map.cpp:55-135 — evaluated as one
    fused elementwise pass).

    FULLY UNPACKED on purpose: every intermediate is a plain (...,)
    float column and the only layout op is the final stack. The packed
    form (stack/cross/einsum on (..., 3, 3) tensors) defeats XLA's
    elementwise fusion — at full-table scale (L*C = 786k rows) it
    measured ~100 ms of unfused HBM streams where this form runs at the
    output-write floor (see ops/eig3.eigh3_cols).

    st16: (..., 16) gathered stats rows; keys: (..., 3) the voxel keys
    the rows were addressed by; vsize/init_num/has_kids: per-layer
    scalars (broadcastable). Returns (..., 22) rec-layout rows (see the
    _ISPL column legend)."""
    raw = st16[..., 0]
    cut = raw >= CUT_MARK if cfg.sticky_cut else jnp.zeros(
        raw.shape, bool)
    n = jnp.where(cut, raw - CUT_MARK, raw)
    n_safe = jnp.maximum(n, 1.0)
    inv_n = 1.0 / n_safe
    mx = st16[..., 1] * inv_n
    my = st16[..., 2] * inv_n
    mz = st16[..., 3] * inv_n
    # cov = sum_pp / n - mean mean^T (+ 1e-9 I for conditioning)
    cxx = st16[..., 4] * inv_n - mx * mx + 1e-9
    cxy = st16[..., 5] * inv_n - mx * my
    cxz = st16[..., 6] * inv_n - mx * mz
    cyy = st16[..., 7] * inv_n - my * my + 1e-9
    cyz = st16[..., 8] * inv_n - my * mz
    czz = st16[..., 9] * inv_n - mz * mz + 1e-9
    lam0, lam1, lam2, v0, v1, v2 = eig3.eigh3_cols(
        cxx, cxy, cxz, cyy, cyz, czz)
    enough = n > init_num
    fits = lam0 < cfg.planner_threshold
    marginal = (
        fits & (lam0 > cfg.planner_threshold * cfg.pre_descend_margin)
        & (has_kids > 0.5)
    ) if cfg.pre_descend_margin < 1.0 else jnp.zeros_like(enough)
    is_plane = jnp.where(
        cut, -1.0,
        jnp.where(fits & enough, jnp.where(marginal, 0.75, 1.0), 0.0))

    qx = (keys[..., 0].astype(jnp.float32) + 0.5) * vsize + mx
    qy = (keys[..., 1].astype(jnp.float32) + 0.5) * vsize + my
    qz = (keys[..., 2].astype(jnp.float32) + 0.5) * vsize + mz
    nx, ny, nz = v0
    d = -(nx * qx + ny * qy + nz * qz)
    radius = jnp.sqrt(jnp.clip(lam2, 0.0, None))

    # cov(n) = sigma2 * (d1 u1 u1^T + d2 u2 u2^T), sym6 components
    cb_xx = st16[..., 10] * inv_n
    cb_xy = st16[..., 11] * inv_n
    cb_xz = st16[..., 12] * inv_n
    cb_yy = st16[..., 13] * inv_n
    cb_yz = st16[..., 14] * inv_n
    cb_zz = st16[..., 15] * inv_n
    sigma2 = (cb_xx + cb_yy + cb_zz) / 3.0
    dmin = 1e-6
    d1 = (lam1 + lam0) / (n_safe * jnp.maximum((lam0 - lam1) ** 2, dmin))
    d2 = (lam2 + lam0) / (n_safe * jnp.maximum((lam0 - lam2) ** 2, dmin))
    u1x, u1y, u1z = v1
    u2x, u2y, u2z = v2
    s1, s2 = sigma2 * d1, sigma2 * d2
    nn_xx = s1 * u1x * u1x + s2 * u2x * u2x
    nn_xy = s1 * u1x * u1y + s2 * u2x * u2y
    nn_xz = s1 * u1x * u1z + s2 * u2x * u2z
    nn_yy = s1 * u1y * u1y + s2 * u2y * u2y
    nn_yz = s1 * u1y * u1z + s2 * u2y * u2z
    nn_zz = s1 * u1z * u1z + s2 * u2z * u2z
    return jnp.stack(
        [
            is_plane,
            nx, ny, nz, d, qx, qy, qz, radius,
            nn_xx, nn_xy, nn_xz, nn_yy, nn_yz, nn_zz,
            cb_xx * inv_n, cb_xy * inv_n, cb_xz * inv_n,
            cb_yy * inv_n, cb_yz * inv_n, cb_zz * inv_n,
            n,
        ],
        axis=-1,
    )  # (..., 22)


def derive_rec(vmap_state: VoxelMap, cfg: VoxelMapConfig) -> jnp.ndarray:
    """(L, C, 22) derived plane records for the WHOLE table (tools /
    tests / exporters; the hot paths derive per gathered row instead).
    Unoccupied slots carry n=0 -> is_plane 0; callers mask by
    `keys[..., 0] != EMPTY` when they need occupancy."""
    vs = layer_voxel_sizes(cfg)
    inits = layer_init_nums(cfg)
    hk = layer_has_kids(cfg)
    return jax.vmap(
        lambda k, st, v, i, h: _derive_from_stats(st, k, v, i, h, cfg)
    )(vmap_state.keys, vmap_state.stats, vs, inits, hk)


def _refresh(keys, stats, cfg: VoxelMapConfig) -> VoxelMap:
    """Rebuild the rec cache from (keys, stats) with ONE full-table
    streaming derivation (no scatters; ~0.8 ms at L=3, C=2^18 on chip —
    scripts/micro_match.py). Every mutation path ends here."""
    m = VoxelMap(keys=keys, stats=stats,
                 rec=jnp.zeros((keys.shape[0], keys.shape[1], REC_W),
                               jnp.float32))
    return m._replace(rec=derive_rec(m, cfg))


def _accumulate_layer(keys, stats, slots_l, ok, vsize, pts, var6):
    """The ONE insert write for a layer: a 16-wide scatter-add of the
    running moments for lanes passing the freeze/cut/validity gates.
    Returns stats."""
    N = pts.shape[0]
    C = stats.shape[0]
    w = jnp.where(ok, slots_l, C)
    voxel_center = (keys.astype(jnp.float32) + 0.5) * vsize
    p_local = pts - voxel_center
    pp6 = sym6(p_local[:, :, None] * p_local[:, None, :])
    one_col = jnp.ones((N, 1), jnp.float32)
    contrib = jnp.concatenate([one_col, p_local, pp6, var6], axis=-1)
    return stats.at[w].add(contrib, mode="drop")


def _mark_cut(stats, slots_l, should_cut, cnt_pre):
    """Sticky-cut transition (octo_state_=1): idempotent 1-wide
    scatter-max of count -> cnt_pre + CUT_MARK on lanes whose voxel just
    became a permanent internal node. Every lane of the same voxel
    gathered the same cnt_pre, so duplicate lanes write the same value
    (max = idempotent). Runs AFTER the scatter-add, so the mark also
    freezes the count at its pre-insert value — cut voxels never serve
    planes, so the moment/count mismatch of the transition frame is
    never consumed."""
    C = stats.shape[0]
    w = jnp.where(should_cut, slots_l, C)
    return stats.at[w, 0].max(cnt_pre + CUT_MARK, mode="drop")


def update_map(vmap_state: VoxelMap, pts_w: jnp.ndarray, var_w: jnp.ndarray,
               valid: jnp.ndarray, cfg: VoxelMapConfig,
               mesh=None, compact: bool = False) -> VoxelMap:
    """Insert a frame into every layer with one vmapped op set (the
    flat-layer equivalent of the octree's conditional subdivision —
    inactive layers are masked at query time). var_w: (N, 3, 3) or (N, 6)
    sym6 point world covariances.

    Descent gating (cut_octo_tree, voxel_map.cpp:163-217): a point feeds
    layer l+1 only if its layer-l voxel exists, has enough points, and
    failed the plane fit. The gate reads the PRE-insert voxel state — so
    subdivision takes effect one observation after the voxel crosses the
    threshold, instead of within the same insert as the reference's
    recursion. The payoff is that no layer's insert depends on another
    layer's state: all L layers run as ONE vmapped op set, so the
    latency-bound random-access count is per-frame, not per-layer.

    SPMD contract: map *reads* (match_planes/query_plane) accept
    measurement arrays sharded over a mesh axis — gathers from the
    replicated table partition cleanly. Map *writes* must see the same
    points on every device (the insert claim protocol mutates the table
    between probe rounds); pass `mesh` to constrain the inputs replicated
    (XLA inserts the all-gather — this is the backend's one cross-device
    reduction)."""
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        rep = NamedSharding(mesh, PartitionSpec())
        pts_w = jax.lax.with_sharding_constraint(pts_w, rep)
        var_w = jax.lax.with_sharding_constraint(var_w, rep)
        valid = jax.lax.with_sharding_constraint(valid, rep)
    var_w6 = var_w if var_w.ndim == 2 else sym6(var_w)
    vs = layer_voxel_sizes(cfg)
    inits = layer_init_nums(cfg)
    hk = layer_has_kids(cfg)
    L, N = cfg.n_layers, pts_w.shape[0]
    compact_to = cfg.insert_compact if compact else 0
    descend = cfg.descend_compact if compact else 0
    if descend and descend < N and L > 1:
        return _update_map_descend(vmap_state, pts_w, var_w6, valid, cfg,
                                   compact_to, descend)
    keys_L = jnp.floor(
        pts_w[None, :, :] / vs[:, None, None]
    ).astype(jnp.int32)  # (L, N, 3)

    # Phase 1 — one vmapped windowed lookup over all layers, plus the
    # pre-insert voxel meta (count + is_plane, one row of the rec cache)
    # the gates need.
    slot0, found0, empty_rows = jax.vmap(
        lambda tab, k: _lookup_window(tab, k, cfg.probes)
    )(vmap_state.keys, keys_L)
    sg = jnp.where(found0, slot0, 0)
    pre_rec = jax.vmap(lambda rc, s: rc[s])(vmap_state.rec, sg)  # (L,N,22)
    cnt_pre = jnp.where(found0, pre_rec[:, :, _CNT], 0.0)
    col_pre = jnp.where(found0, pre_rec[:, :, _ISPL], 0.0)
    cut_pre = found0 & (col_pre < -0.5)

    # Descent chain from the pre-insert states: a point feeds layer l
    # when its layer l-1 voxel has enough points and is CUT (-1),
    # MARGINAL (0.75) or enough-but-undecided (0.0) — everything except
    # a solid plane (col < 0.9; see the _ISPL legend).
    valid_l = [valid]
    for li in range(1, L):
        sub = (found0[li - 1] & (cnt_pre[li - 1] > inits[li - 1])
               & (col_pre[li - 1] < 0.9))
        valid_l.append(valid_l[-1] & sub)
    valid_L = jnp.stack(valid_l)  # (L, N)

    # Phase 2 — claim rounds for new keys (vmapped over layers; unresolved
    # lanes optionally compacted as in _insert).
    unresolved = valid_L & ~found0 & (empty_rows[:, :, 0] >= 0)
    keys_new, slot_add = jax.vmap(
        lambda kt, k, t, u: _claim_compacted(kt, k, t, u, compact_to)
    )(vmap_state.keys, keys_L, empty_rows, unresolved)
    slots = jnp.where(found0, slot0, jnp.where(unresolved, slot_add, -1))

    # Phase 3 — freeze/cut gates + ONE 16-wide scatter-add per layer.
    frozen = cnt_pre >= cfg.max_points_num  # claimed slots have cnt_pre 0
    ok = valid_L & (slots >= 0) & ~frozen & ~cut_pre
    stats_new = jax.vmap(
        lambda k, st, sl, o, v: _accumulate_layer(k, st, sl, o, v,
                                                  pts_w, var_w6)
    )(keys_L, vmap_state.stats, slots, ok, vs)
    if cfg.sticky_cut:
        # Transition detection from the pre-insert derivation: undecided
        # (col 0) with enough points at a layer that has children =
        # enough & ~fits & has_kids (fits & enough would have derived
        # 1.0/0.75). One frame later than the reference's in-recursion
        # cut — same lag as the descent gate above.
        should_cut = (found0 & (jnp.abs(col_pre) < 0.25)
                      & (cnt_pre > inits[:, None]) & (hk[:, None] > 0.5)
                      & ~cut_pre)
        stats_new = jax.vmap(_mark_cut)(stats_new, slots, should_cut,
                                        cnt_pre)
    return _refresh(keys_new, stats_new, cfg)


def _update_map_descend(vmap_state: VoxelMap, pts_w, var_w6, valid,
                        cfg: VoxelMapConfig, compact_to: int, D: int):
    """Steady-state insert with layer-descent compaction: layer 0 runs on
    all N lanes; layers >= 1 run on the <= D points whose layer-0 voxel
    exists, has enough points, and failed the plane test (the only points
    the octree semantics subdivide). Same pre-insert gating as the full
    path — with descend_compact >= the frame's true descending count the
    resulting map is IDENTICAL; overflow lanes skip the fine layers this
    frame and contribute again on the next observation."""
    vs = layer_voxel_sizes(cfg)
    inits = layer_init_nums(cfg)
    hk = layer_has_kids(cfg)
    L, N = cfg.n_layers, pts_w.shape[0]

    # ---- layer 0 on all N lanes ----
    keys0 = jnp.floor(pts_w / vs[0]).astype(jnp.int32)
    slot0, found0, empty0 = _lookup_window(vmap_state.keys[0], keys0,
                                           cfg.probes)
    pre0 = vmap_state.rec[0][jnp.where(found0, slot0, 0)]
    cnt0 = jnp.where(found0, pre0[:, _CNT], 0.0)
    col0 = jnp.where(found0, pre0[:, _ISPL], 0.0)
    cut0 = found0 & (col0 < -0.5)
    unres0 = valid & ~found0 & (empty0[:, 0] >= 0)
    keys_tab0, slot_add0 = _claim_compacted(
        vmap_state.keys[0], keys0, empty0, unres0, compact_to)
    slots0 = jnp.where(found0, slot0, jnp.where(unres0, slot_add0, -1))
    frozen0 = cnt0 >= cfg.max_points_num
    ok0 = valid & (slots0 >= 0) & ~frozen0 & ~cut0
    stats0 = _accumulate_layer(keys0, vmap_state.stats[0], slots0, ok0,
                               vs[0], pts_w, var_w6)
    if cfg.sticky_cut:
        should0 = (found0 & (jnp.abs(col0) < 0.25) & (cnt0 > inits[0])
                   & ~cut0)
        stats0 = _mark_cut(stats0, slots0, should0, cnt0)

    # ---- compact descending lanes (everything except solid planes —
    # cut, marginal, and enough-but-undecided; see the _ISPL legend) ----
    sub = valid & found0 & (cnt0 > inits[0]) & (col0 < 0.9)
    lane = _compact_lanes(sub, D)
    li = jnp.minimum(lane, N - 1)
    sub_valid = lane < N
    pts_s = pts_w[li]
    var_s = var_w6[li]

    # ---- layers 1..L-1 on D lanes, vmapped ----
    keys_S = jnp.floor(
        pts_s[None, :, :] / vs[1:, None, None]
    ).astype(jnp.int32)  # (L-1, D, 3)
    slotS, foundS, emptyS = jax.vmap(
        lambda tab, k: _lookup_window(tab, k, cfg.probes)
    )(vmap_state.keys[1:], keys_S)
    sgS = jnp.where(foundS, slotS, 0)
    preS = jax.vmap(lambda rc, s: rc[s])(vmap_state.rec[1:], sgS)
    cntS = jnp.where(foundS, preS[:, :, _CNT], 0.0)
    colS = jnp.where(foundS, preS[:, :, _ISPL], 0.0)
    cutS = foundS & (colS < -0.5)

    valid_l = [sub_valid]
    for l in range(2, L):  # descent into layer l gated by layer l-1 meta
        subn = (foundS[l - 2] & (cntS[l - 2] > inits[l - 1])
                & (colS[l - 2] < 0.9))
        valid_l.append(valid_l[-1] & subn)
    valid_S = jnp.stack(valid_l)  # (L-1, D)

    unresS = valid_S & ~foundS & (emptyS[:, :, 0] >= 0)
    keysS_new, slot_addS = jax.vmap(
        lambda kt, k, t, u: _claim_compacted(
            kt, k, t, u, compact_to if compact_to < D else 0)
    )(vmap_state.keys[1:], keys_S, emptyS, unresS)
    slotsS = jnp.where(foundS, slotS, jnp.where(unresS, slot_addS, -1))
    frozenS = cntS >= cfg.max_points_num
    okS = valid_S & (slotsS >= 0) & ~frozenS & ~cutS
    statsS = jax.vmap(
        lambda k, st, sl, o, v, p, vr: _accumulate_layer(k, st, sl, o, v,
                                                         p, vr)
    )(keys_S, vmap_state.stats[1:], slotsS, okS, vs[1:],
      jnp.broadcast_to(pts_s, (L - 1,) + pts_s.shape),
      jnp.broadcast_to(var_s, (L - 1,) + var_s.shape))
    if cfg.sticky_cut:
        shouldS = (foundS & (jnp.abs(colS) < 0.25)
                   & (cntS > inits[1:, None]) & (hk[1:, None] > 0.5)
                   & ~cutS)
        statsS = jax.vmap(_mark_cut)(statsS, slotsS, shouldS, cntS)

    return _refresh(
        jnp.concatenate([keys_tab0[None], keysS_new]),
        jnp.concatenate([stats0[None], statsS]), cfg)


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
    layer: jnp.ndarray  # (N,) int32 winning candidate: 0..L-1 = own
    # chain layer, L = neighbor root voxel, > L = sibling; -1 = no match
    # (diagnostic — the per-match layer histogram VERDICT r4 item 1
    # asks for; scripts/diag_map.py consumes it)


def _gate(rec, found, pts_w, var_w6, cfg: VoxelMapConfig):
    """Candidate gating from a derived plane record (build_single_residual,
    voxel_map.cpp:713-767). Pure register math — no memory access."""
    is_pl = (rec[:, _ISPL] > 0.5) & found
    n = rec[:, _PL0:_PL0 + 3]
    d = rec[:, _PL0 + 3]
    c = rec[:, _PL0 + 4:_PL0 + 7]
    radius = rec[:, _PL0 + 7]
    cov_nn6 = rec[:, _PC0:_PC0 + 6]
    cov_qq6 = rec[:, _PC0 + 6:_PC0 + 12]

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
    fields = jnp.concatenate(
        [n, d[:, None], c, dist[:, None], sigma_plane[:, None],
         cov_nn6, cov_qq6], axis=-1,
    )  # (N, 21)
    return is_pl, ok, prob, fields


def match_planes(vmap_state: VoxelMap, pts_w: jnp.ndarray, var_w,
                 valid: jnp.ndarray, cfg: VoxelMapConfig) -> PlaneMatch:
    """Point-to-plane correspondence search (BuildResidualListOMP +
    build_single_residual, voxel_map.cpp:643-786) as fixed-shape batch ops:
    one windowed gather per (layer-chain + neighbor) candidate set, the
    plane record derived from the gathered moments in registers, gating
    in registers, max-probability selection.

    Per point we gate up to n_layers + 1 (+ n_layers - 1 with
    sibling_search) candidates: the containing voxel chain (layer l
    active iff its ancestors exist and are not planes), the nearest
    neighbor root voxel, which is only considered when the own chain
    fails (:680-691), and — sibling_search, default OFF (see
    VoxelMapConfig: measured ATE-neutral) — the nearest
    SIBLING sub-voxel at each layer >= 1 by the same quarter rule (the
    reference recurses into all 8 children of a non-plane node,
    :713-786; the nearest sibling covers the boundary-point case at one
    gather per fine layer instead of 8). Remaining deviation:
    - the neighbor shift uses the point's offset within its voxel in
      meters (the reference compares voxel-unit coordinates with
      meter-unit centers at :683-688, which we read as unintended).
    """
    var_w6 = var_w if var_w.ndim == 2 else sym6(var_w)
    n_pts = pts_w.shape[0]
    L = cfg.n_layers
    vsizes = layer_voxel_sizes(cfg)
    keys_L = jnp.floor(
        pts_w[None, :, :] / vsizes[:, None, None]
    ).astype(jnp.int32)  # (L, N, 3)

    def quarter_shift(li):
        """Nearest-neighbor shift at layer li by in-voxel offset
        (quarter-length rule)."""
        center = (keys_L[li].astype(jnp.float32) + 0.5) * vsizes[li]
        off = pts_w - center
        q = vsizes[li] / 4.0
        return jnp.where(off > q, 1,
                         jnp.where(off < -q, -1, 0)).astype(jnp.int32)

    extra = [(keys_L[0] + quarter_shift(0))[None]]
    sib_layers = list(range(1, L)) if cfg.sibling_search else []
    for li in sib_layers:
        extra.append((keys_L[li] + quarter_shift(li))[None])
    keys_all = jnp.concatenate([keys_L] + extra, axis=0)

    idx = jnp.asarray(list(range(L)) + [0] + sib_layers)
    keys_tabs = vmap_state.keys[idx]  # (L+1+S, C, 3)
    recs = vmap_state.rec[idx]  # (L+1+S, C, 22)

    def one(keys_tab, rec_tab, keys):
        slot, found, _ = _lookup_window(keys_tab, keys, cfg.probes)
        rec = rec_tab[jnp.where(found, slot, 0)]
        rec = jnp.where(found[:, None], rec, 0.0)
        is_pl, ok, prob, fields = _gate(rec, found, pts_w, var_w6, cfg)
        return found, is_pl, ok, prob, fields

    exists, is_pl, ok, prob, fields = jax.vmap(one)(keys_tabs, recs, keys_all)

    if cfg.match_finest:
        # Multi-resolution selection (r5): every gated plane along the
        # containing chain is a candidate and the DEEPEST wins; the
        # neighbor root stays a fallback when no own-chain plane gates.
        # (The reference stops at the first plane in the chain —
        # find_correspond, voxel_map.cpp:292-305 — because its internal
        # nodes never carry planes; with pre-descent the flat-layer map
        # has fine planes even under solid parents, and preferring them
        # is what closes the large-voxel accuracy gap.)
        actives = [ok[li] for li in range(cfg.n_layers)]
        any_own = jnp.zeros(n_pts, bool)
        for a in actives:
            any_own = any_own | a
        actives.append(ok[cfg.n_layers] & ~any_own)
        for si, li in enumerate(sib_layers):
            actives.append(ok[cfg.n_layers + 1 + si] & ~any_own)
        active = jnp.stack(actives, axis=0)  # (L+1+S, N)
        # rank: own chain layer l -> l+1 (deeper wins); neighbor and
        # sibling candidates rank 0 (only active when no own match).
        ranks = jnp.asarray(
            [li + 1.0 for li in range(cfg.n_layers)]
            + [0.0] * (1 + len(sib_layers)), jnp.float32)
        score = jnp.where(active, ranks[:, None], -1.0)
        best = jnp.argmax(score, axis=0)
        any_valid = (jnp.max(score, axis=0) >= 0.0) & valid
    else:
        # Chain masks (octree descent semantics) — tiny (L, N) logic.
        ancestor_open = jnp.ones(n_pts, bool)
        actives = []
        opens = []  # ancestor_open at each layer (sibling admission mask)
        for li in range(cfg.n_layers):
            opens.append(ancestor_open)
            active = ancestor_open & ok[li]
            actives.append(active)
            ancestor_open = ancestor_open & exists[li] & ~is_pl[li]
        any_own = jnp.zeros(n_pts, bool)
        for a in actives:
            any_own = any_own | a
        actives.append(ok[cfg.n_layers] & ~any_own)
        # Sibling candidates admitted exactly where the reference would
        # recurse into the children: the parent chain is open at that
        # layer.
        for si, li in enumerate(sib_layers):
            actives.append(opens[li] & ok[cfg.n_layers + 1 + si])
        active = jnp.stack(actives, axis=0)  # (L+1+S, N)

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
        layer=jnp.where(any_valid, best.astype(jnp.int32), -1),
    )


def query_plane(vmap_state: VoxelMap, pts_w: jnp.ndarray, cfg: VoxelMapConfig):
    """Ungated plane lookup along the containing chain: the first layer
    whose voxel is a fitted plane wins (VoxelOctoTree::find_correspond,
    voxel_map.cpp:292-305). Used by the VIO normal refinement
    (vio.cpp:981-1034). Returns (found, normal, d, center, radius,
    sigma_l) with sigma_l = a^T cov_nn a + n^T cov_qq n at pts_w."""
    n_pts = pts_w.shape[0]
    vsizes = layer_voxel_sizes(cfg)
    keys_L = jnp.floor(pts_w[None, :, :] / vsizes[:, None, None]).astype(jnp.int32)

    def one(keys_tab, rec_tab, keys):
        slot, found, _ = _lookup_window(keys_tab, keys, cfg.probes)
        rec = rec_tab[jnp.where(found, slot, 0)]
        rec = jnp.where(found[:, None], rec, 0.0)
        is_pl = (rec[:, _ISPL] > 0.5) & found
        a = pts_w - rec[:, _PL0 + 4:_PL0 + 7]
        n = rec[:, _PL0:_PL0 + 3]
        sigma = quad6(rec[:, _PC0:_PC0 + 6], a) + quad6(
            rec[:, _PC0 + 6:_PC0 + 12], n
        )
        return found, is_pl, rec[:, _PL0:_PL1], sigma

    exists, is_pl, pl, sigma = jax.vmap(one)(
        vmap_state.keys, vmap_state.rec, keys_L)
    found = jnp.zeros(n_pts, bool)
    out_plane = jnp.zeros((n_pts, 8))
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


def map_keys(vmap_state: VoxelMap, layer: int) -> jnp.ndarray:
    """(C, 3) int32 keys of one layer (EMPTY-marked), for tests/tools."""
    return vmap_state.keys[layer]


def map_count(vmap_state: VoxelMap, layer: int) -> jnp.ndarray:
    raw = vmap_state.stats[layer][:, 0]
    return jnp.where(raw >= CUT_MARK, raw - CUT_MARK, raw).astype(jnp.int32)


def slide_map(vmap_state: VoxelMap, center_pos: jnp.ndarray,
              half_map_size: int, cfg: VoxelMapConfig) -> VoxelMap:
    """Local-map sliding: evict voxels outside a half_map_size box around
    the current position (mapSliding/clearMemOutOfMap,
    voxel_map.cpp:924-971). Open addressing cannot delete slots in place
    (probe chains would break), so each layer is *rebuilt*: surviving keys
    re-inserted into a fresh table and their stats rows gathered across.
    Intended to be called rarely (when the pose moved > sliding_thresh,
    like the reference)."""
    vsizes = layer_voxel_sizes(cfg)
    halves = jnp.asarray(
        [half_map_size * (1 << l) for l in range(cfg.n_layers)], jnp.int32
    )
    C = vmap_state.stats.shape[1]

    def one(keys_tab, stats, vsize, half):
        ctr = jnp.floor(center_pos / vsize).astype(jnp.int32)
        occupied = keys_tab[:, 0] != EMPTY
        keep = occupied & jnp.all(jnp.abs(keys_tab - ctr) <= half, axis=-1)
        fresh = jnp.full((C, 3), EMPTY, jnp.int32)
        # Full probe window of claim rounds here (no lane compaction): the
        # rebuild reinserts every surviving key in this one call, so each
        # lane must be able to walk its whole probe window.
        fresh, new_slots = _insert(fresh, keys_tab, keep, cfg.probes,
                                   compact_to=0, claim_rounds=cfg.probes)
        dst = jnp.where(keep & (new_slots >= 0), new_slots, C)
        return fresh, jnp.zeros_like(stats).at[dst].set(stats, mode="drop")

    keys, stats = jax.vmap(one)(
        vmap_state.keys, vmap_state.stats, vsizes, halves,
    )
    return _refresh(keys, stats, cfg)
