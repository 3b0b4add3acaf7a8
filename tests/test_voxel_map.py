"""Voxel hash + plane map + LIO ESIKF tests on synthetic planar scenes."""

import numpy as np
import jax.numpy as jnp

from fast_livo2_tpu.ops import voxel_hash
from fast_livo2_tpu.core import voxel_map as vm
from fast_livo2_tpu.core import lio
from fast_livo2_tpu.core.state import boxminus, boxplus, init_cov, init_state


def test_hash_insert_lookup_roundtrip():
    table = voxel_hash.make_table(1024)
    rng = np.random.default_rng(0)
    keys = rng.integers(-50, 50, size=(300, 3)).astype(np.int32)
    valid = jnp.ones(300, bool)
    table, slots = voxel_hash.lookup_or_insert(table, jnp.asarray(keys), valid)
    slots = np.asarray(slots)
    assert (slots >= 0).all()
    # Duplicate keys must map to the same slot.
    back = np.asarray(voxel_hash.lookup(table, jnp.asarray(keys)))
    np.testing.assert_array_equal(slots, back)
    uniq, inv = np.unique(keys, axis=0, return_inverse=True)
    for u in range(len(uniq)):
        assert len(set(slots[inv == u])) == 1
    # Unknown keys miss.
    miss = np.asarray(voxel_hash.lookup(table, jnp.asarray([[999, 999, 999]], jnp.int32)))
    assert miss[0] == -1


def _plane_points(rng, n, normal, d, extent=4.0, noise=0.005):
    """Sample points on plane n·p + d = 0."""
    normal = np.asarray(normal, np.float64)
    normal = normal / np.linalg.norm(normal)
    # basis
    a = np.array([1.0, 0, 0]) if abs(normal[0]) < 0.9 else np.array([0, 1.0, 0])
    b1 = np.cross(normal, a)
    b1 /= np.linalg.norm(b1)
    b2 = np.cross(normal, b1)
    uv = rng.uniform(-extent, extent, size=(n, 2))
    p0 = -d * normal
    pts = p0 + uv[:, :1] * b1 + uv[:, 1:] * b2
    pts += rng.normal(size=(n, 3)) * noise
    return pts.astype(np.float32)


def _scene(rng, n_per=3000):
    """Floor + two walls, in front of the origin."""
    pts = np.concatenate(
        [
            _plane_points(rng, n_per, [0, 0, 1], 1.0),  # floor z=-1... n·p+d=0 -> z=-1
            _plane_points(rng, n_per, [1, 0, 0], -5.0),  # wall x=5
            _plane_points(rng, n_per, [0, 1, 0], -5.0),  # wall y=5
        ]
    )
    return pts


MAP_CFG = vm.VoxelMapConfig(voxel_size=0.5, n_layers=2, capacity_log2=14,
                            planner_threshold=0.0025, layer_init_num=(5, 5))


def test_map_build_and_match():
    rng = np.random.default_rng(1)
    pts_w = jnp.asarray(_scene(rng, 9000))
    n = pts_w.shape[0]
    var_w = jnp.tile(jnp.eye(3) * 1e-4, (n, 1, 1))
    valid = jnp.ones(n, bool)

    m = vm.make_map(MAP_CFG)
    m = vm.update_map(m, pts_w, var_w, valid, MAP_CFG)

    # Fresh samples from the same planes must match with tiny residuals.
    rng2 = np.random.default_rng(2)
    q = jnp.asarray(_scene(rng2, 500))
    vq = jnp.tile(jnp.eye(3) * 1e-4, (q.shape[0], 1, 1))
    match = vm.match_planes(m, q, vq, jnp.ones(q.shape[0], bool), MAP_CFG)
    frac = float(jnp.mean(match.valid.astype(jnp.float32)))
    assert frac > 0.85, f"only {frac:.2%} matched"
    res = np.asarray(jnp.abs(match.dist))[np.asarray(match.valid)]
    assert np.mean(res) < 0.02, np.mean(res)
    # Matched normals align with a true plane normal.
    nrm = np.asarray(match.normal)[np.asarray(match.valid)]
    alignment = np.max(np.abs(nrm @ np.array([[0, 0, 1.0], [1, 0, 0], [0, 1, 0]]).T), axis=1)
    assert np.mean(alignment) > 0.98


def test_lio_update_converges_to_true_pose():
    rng = np.random.default_rng(3)
    pts_w = jnp.asarray(_scene(rng))
    n = pts_w.shape[0]
    var_w = jnp.tile(jnp.eye(3) * 1e-4, (n, 1, 1))
    m = vm.make_map(MAP_CFG)
    m = vm.update_map(m, pts_w, var_w, jnp.ones(n, bool), MAP_CFG)

    # True pose: small offset from origin; body points = R^T (p_w - t)
    true_delta = np.zeros(19, np.float32)
    true_delta[0:3] = [0.02, -0.015, 0.03]   # rotation vector
    true_delta[3:6] = [0.05, -0.04, 0.03]    # translation
    s_true = boxplus(init_state(), jnp.asarray(true_delta))

    rng2 = np.random.default_rng(4)
    sample_w = jnp.asarray(_scene(rng2, 1200))
    pts_body = (sample_w - s_true.pos) @ s_true.rot  # R^T (p - t), row convention

    # Propagated state = identity (the wrong pose); the update must pull it
    # to the true pose.
    state_prop = init_state()
    cov_prop = init_cov()
    res = lio.lio_update(
        state_prop, cov_prop, m, pts_body, jnp.ones(pts_body.shape[0], bool),
        jnp.eye(3), jnp.zeros(3), MAP_CFG, max_iterations=5,
    )
    err_before = np.linalg.norm(np.asarray(boxminus(s_true, state_prop))[:6])
    err_after = np.linalg.norm(np.asarray(boxminus(s_true, res.state))[:6])
    assert err_after < 0.2 * err_before, (err_before, err_after)
    assert err_after < 0.01, err_after
    assert int(res.n_effective) > 2000
    # Posterior covariance must shrink in the updated block.
    assert float(res.cov[3, 3]) < float(cov_prop[3, 3])


def test_voxel_downsample():
    rng = np.random.default_rng(5)
    pts = rng.uniform(-2, 2, size=(5000, 3)).astype(np.float32)
    valid = jnp.ones(5000, bool)
    out, out_valid = lio.voxel_downsample(jnp.asarray(pts), valid, 0.5, 2048)
    nv = int(jnp.sum(out_valid))
    # 8 voxels per axis -> at most 512 occupied cells... 4/0.5=8 per axis
    assert 400 < nv <= 512
    o = np.asarray(out)[np.asarray(out_valid)]
    k = np.floor(o / 0.5).astype(int)
    uniq = np.unique(k, axis=0)
    assert len(uniq) == nv  # one centroid per occupied voxel
    # Centroids must lie inside their voxel.
    assert (o >= k * 0.5 - 1e-5).all() and (o <= (k + 1) * 0.5 + 1e-5).all()


def test_downsample_respects_validity_mask():
    pts = np.zeros((100, 3), np.float32)
    pts[:50] = [10, 10, 10]
    valid = jnp.asarray([True] * 50 + [False] * 50)
    out, out_valid = lio.voxel_downsample(jnp.asarray(pts), valid, 0.5, 64)
    assert int(jnp.sum(out_valid)) == 1
    np.testing.assert_allclose(np.asarray(out[0]), [10, 10, 10], atol=1e-5)


def test_compacted_insert_matches_full():
    """Steady-state insert path: compacting unresolved keys before the
    claim rounds must produce the same map as the full-lane loop when the
    compact buffer fits the new keys."""
    cfg = vm.VoxelMapConfig(voxel_size=0.5, n_layers=2, capacity_log2=10,
                            layer_init_num=(3, 3), insert_compact=256)
    rng = np.random.default_rng(3)
    base = rng.uniform(-4, 4, (600, 3)).astype(np.float32)
    base[:, 2] = 0.002 * rng.normal(size=600).astype(np.float32)
    var = jnp.tile(jnp.eye(3, dtype=jnp.float32) * 1e-4, (600, 1, 1))
    valid = jnp.ones(600, bool)

    m0 = vm.update_map(vm.make_map(cfg), jnp.asarray(base), var, valid, cfg)

    # Second frame: mostly revisits + 100 new-area points (unresolved
    # lanes count POINTS, not voxels — keep them under 256 lanes).
    nxt = np.concatenate([
        base[:500] + rng.normal(size=(500, 3)).astype(np.float32) * 0.001,
        (rng.uniform(5, 8, (100, 3)) * np.array([1, 1, 0.001])).astype(np.float32),
    ])
    var2 = jnp.tile(jnp.eye(3, dtype=jnp.float32) * 1e-4, (600, 1, 1))
    m_full = vm.update_map(m0, jnp.asarray(nxt), var2, valid, cfg,
                           compact=False)
    m_cmp = vm.update_map(m0, jnp.asarray(nxt), var2, valid, cfg,
                          compact=True)

    # Same voxel sets (slot order may differ within a probe window only if
    # claim order differs; keys are claimed in lane order both ways, so
    # tables must match exactly).
    np.testing.assert_array_equal(np.asarray(m_full.keys), np.asarray(m_cmp.keys))
    np.testing.assert_allclose(np.asarray(m_full.stats), np.asarray(m_cmp.stats),
                               rtol=1e-6, atol=1e-6)


def test_compacted_insert_overflow_drops_gracefully():
    """More new keys than compact lanes: the overflow is dropped this
    frame (re-inserted when next observed), never corrupting the table."""
    cfg = vm.VoxelMapConfig(voxel_size=0.5, n_layers=1, capacity_log2=10,
                            layer_init_num=(3,), insert_compact=16)
    rng = np.random.default_rng(4)
    pts = rng.uniform(-20, 20, (400, 3)).astype(np.float32)  # ~hundreds of voxels
    var = jnp.tile(jnp.eye(3, dtype=jnp.float32) * 1e-4, (400, 1, 1))
    valid = jnp.ones(400, bool)
    m = vm.update_map(vm.make_map(cfg), jnp.asarray(pts), var, valid, cfg,
                      compact=True)
    keys = np.asarray(m.keys[0])
    occ = keys[:, 0] != vm.EMPTY
    assert 0 < occ.sum() <= 16  # one claimed slot per compact lane
    # All occupied slots hold keys from the input set.
    in_keys = set(map(tuple, np.floor(pts / 0.5).astype(np.int32)))
    for k in keys[occ]:
        assert tuple(k) in in_keys
    # Dropped keys insert on the next frame.
    m2 = vm.update_map(m, jnp.asarray(pts), var, valid, cfg, compact=True)
    assert (np.asarray(m2.keys[0])[:, 0] != vm.EMPTY).sum() >= occ.sum()


def test_descend_compacted_insert_matches_full():
    """Layer-descent compaction: with descend_compact >= the true number
    of descending points, the resulting map must be IDENTICAL to the
    full-lane multi-layer insert."""
    rng = np.random.default_rng(5)
    # Non-planar cluster (forces layer-0 plane failure -> descent) +
    # planar sheet (stays at layer 0).
    blob = rng.uniform(-1, 1, (300, 3)).astype(np.float32)  # 1 voxel region
    sheet = rng.uniform(-4, 4, (300, 3)).astype(np.float32)
    sheet[:, 2] = 0.002 * rng.normal(size=300).astype(np.float32) + 3.0
    pts = np.concatenate([blob, sheet])
    var = jnp.tile(jnp.eye(3, dtype=jnp.float32) * 1e-4, (600, 1, 1))
    valid = jnp.ones(600, bool)

    base_cfg = dict(voxel_size=2.0, n_layers=3, capacity_log2=10,
                    layer_init_num=(5, 5, 5), planner_threshold=0.0025)
    cfg_full = vm.VoxelMapConfig(**base_cfg)
    cfg_desc = vm.VoxelMapConfig(**base_cfg, descend_compact=512)

    m0 = vm.update_map(vm.make_map(cfg_full), jnp.asarray(pts), var, valid,
                       cfg_full)
    # Steady frames: revisit with jitter (descent now active for the blob).
    for seed in (6, 7):
        r2 = np.random.default_rng(seed)
        nxt = pts + r2.normal(size=pts.shape).astype(np.float32) * 0.01
        m_full = vm.update_map(m0, jnp.asarray(nxt), var, valid, cfg_full,
                               compact=True)
        m_desc = vm.update_map(m0, jnp.asarray(nxt), var, valid, cfg_desc,
                               compact=True)
        np.testing.assert_array_equal(np.asarray(m_full.keys),
                                      np.asarray(m_desc.keys))
        np.testing.assert_allclose(np.asarray(m_full.stats),
                                   np.asarray(m_desc.stats),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(vm.derive_rec(m_full, cfg_full)),
            np.asarray(vm.derive_rec(m_desc, cfg_desc)),
            rtol=1e-5, atol=1e-5)
        m0 = m_full

    # Overflow variant: descend_compact smaller than the descending count
    # must still build a valid (subset) map, never corrupt tables.
    cfg_tiny = vm.VoxelMapConfig(**base_cfg, descend_compact=8)
    m_tiny = vm.update_map(m0, jnp.asarray(pts), var, valid, cfg_tiny,
                           compact=True)
    k_full = np.asarray(m_full.keys[1])
    k_tiny = np.asarray(m_tiny.keys[1])
    occ_tiny = k_tiny[:, 0] != vm.EMPTY
    full_set = set(map(tuple, k_full[k_full[:, 0] != vm.EMPTY]))
    for k in k_tiny[occ_tiny]:
        assert tuple(k) in full_set


def test_topology_states_and_pre_descent():
    """r5 topology knobs (_ISPL legend in core/voxel_map.py):
    - marginal planes (lam0 within pre_descend_margin of threshold) read
      0.75, still serve matches, and their CHILDREN pre-accumulate;
    - sticky_cut=True turns an enough-points non-plane voxel with
      children into a permanent internal node (-1) whose stats freeze;
    - match_finest prefers the deepest gated plane in the chain."""
    rng = np.random.default_rng(7)
    n = 4000
    # One flat patch (clear plane) + one thick noisy slab that fails the
    # plane test at the coarse layer, both inside a single 1 m voxel
    # footprint each.
    flat = np.concatenate([
        rng.uniform(0, 1, (n, 2)), 1e-3 * rng.standard_normal((n, 1))
    ], axis=1)
    slab = np.concatenate([
        rng.uniform(2, 3, (n, 2)), 0.40 * rng.uniform(-1, 1, (n, 1))
    ], axis=1)
    # marginal: lam0 just above margin*threshold but below threshold;
    # centered at z=0.5 so the whole distribution stays inside ONE voxel
    # (a straddled boundary would truncate the variance per voxel)
    marg_sigma = 0.04  # lam0 ~ 1.6e-3 in [0.5*0.0025, 0.0025)
    marg = np.concatenate([
        rng.uniform(4, 5, (n, 2)),
        0.5 + marg_sigma * rng.standard_normal((n, 1))
    ], axis=1)
    pts = jnp.asarray(np.concatenate([flat, slab, marg]), jnp.float32)
    var = jnp.tile(jnp.asarray([1e-6, 0, 0, 1e-6, 0, 1e-6]), (3 * n, 1))
    valid = jnp.ones(3 * n, bool)

    cfg = vm.VoxelMapConfig(voxel_size=1.0, n_layers=2, capacity_log2=12,
                            planner_threshold=0.0025,
                            layer_init_num=(5, 5), max_points_num=10 ** 9,
                            pre_descend_margin=0.5)
    m = vm.make_map(cfg)
    for _ in range(3):  # descent gates read PRE-insert state
        m = vm.update_map(m, pts, var, valid, cfg)

    rec0 = np.asarray(vm.derive_rec(m, cfg)[0])
    keys0 = np.asarray(m.keys[0])
    occ0 = keys0[:, 0] != vm.EMPTY

    def col_at(xy):
        k = np.floor(np.array([xy[0], xy[1], 0.0])).astype(np.int32)
        row = np.nonzero(occ0 & (keys0 == k).all(1))[0]
        assert len(row) == 1, (xy, len(row))
        return rec0[row[0], vm._ISPL]

    assert col_at((0.5, 0.5)) == 1.0          # solid plane
    assert col_at((2.5, 2.5)) == 0.0          # enough + failed (refit mode)
    assert abs(col_at((4.5, 4.5)) - 0.75) < 1e-6  # marginal plane

    # children accumulated behind BOTH the failed and the marginal voxel
    cnt1 = np.asarray(m.stats[1][:, 0])
    keys1 = np.asarray(m.keys[1])
    occ1 = keys1[:, 0] != vm.EMPTY

    def child_count(xyz):
        k = np.floor(np.asarray(xyz) / 0.5).astype(np.int32)
        row = np.nonzero(occ1 & (keys1 == k).all(1))[0]
        return cnt1[row[0]] if len(row) else 0.0

    assert child_count((2.2, 2.2, -0.2)) > 0  # behind failed voxel
    assert child_count((4.2, 4.2, 0.45)) > 0  # behind MARGINAL voxel (r5)
    # but not behind the solid plane
    k_solid = np.floor(np.array([0.5 * 2, 0.5 * 2, 0.0])).astype(np.int32)
    row = np.nonzero(occ1 & (keys1 == k_solid).all(1))[0]
    assert len(row) == 0 or cnt1[row[0]] == 0

    # marginal planes still serve matches (is_plane col > 0.5)
    q = jnp.asarray(np.concatenate([
        rng.uniform(4, 5, (64, 2)), np.full((64, 1), 0.5)], axis=1),
        jnp.float32)
    vq = jnp.tile(jnp.asarray([1e-6, 0, 0, 1e-6, 0, 1e-6]), (64, 1))
    mt = vm.match_planes(m, q, vq, jnp.ones(64, bool), cfg)
    assert float(jnp.mean(mt.valid.astype(jnp.float32))) > 0.5

    # sticky_cut: the failed coarse voxel becomes a permanent internal
    # node (-1) and its stats freeze
    cfg_s = cfg._replace(sticky_cut=True)
    ms = vm.make_map(cfg_s)
    for _ in range(2):
        ms = vm.update_map(ms, pts, var, valid, cfg_s)
    rec0s = np.asarray(vm.derive_rec(ms, cfg_s)[0])
    keys0s = np.asarray(ms.keys[0])
    occ0s = keys0s[:, 0] != vm.EMPTY
    k_slab = np.floor(np.array([2.5, 2.5, 0.0])).astype(np.int32)
    row = np.nonzero(occ0s & (keys0s == k_slab).all(1))[0]
    assert rec0s[row[0], vm._ISPL] == -1.0
    cnt_before = float(np.asarray(ms.stats[0][row[0], 0]))
    ms = vm.update_map(ms, pts, var, valid, cfg_s)
    assert float(np.asarray(ms.stats[0][row[0], 0])) == cnt_before  # frozen

    # match_finest: where a fitted child plane exists under a marginal
    # parent, the deepest candidate wins (layer field reports it).
    # Query exactly at fitted child-plane centers (any other point is
    # legitimately 3-sigma-gated away from the child's thin fit).
    rec1 = np.asarray(vm.derive_rec(m, cfg)[1])
    child_pl = occ1 & (rec1[:, vm._ISPL] > 0.5) & (
        np.abs(keys1[:, 0] // 2 - 4) <= 1)  # children under the marg voxel
    assert child_pl.any(), "no fitted child planes under the marginal voxel"
    qc = jnp.asarray(rec1[child_pl][:, vm._PL0 + 4:vm._PL0 + 7])
    vqc = jnp.tile(jnp.asarray([1e-6, 0, 0, 1e-6, 0, 1e-6]),
                   (qc.shape[0], 1))
    cfg_f = cfg._replace(match_finest=True)
    mtf = vm.match_planes(m, qc, vqc, jnp.ones(qc.shape[0], bool), cfg_f)
    lay = np.asarray(mtf.layer)[np.asarray(mtf.valid)]
    assert (lay >= 1).any(), "finest-first never reached a child plane"
    # coarse-first on the same queries stays at the (marginal) parent
    mtc = vm.match_planes(m, qc, vqc, jnp.ones(qc.shape[0], bool), cfg)
    layc = np.asarray(mtc.layer)[np.asarray(mtc.valid)]
    assert (layc == 0).all()


def test_rec_cache_coherent_after_mutations():
    """The rec CACHE invariant (r5): after every mutation path
    (update_map full, compacted, descend; slide_map) the stored rec
    equals a fresh derivation from (keys, stats)."""
    rng = np.random.default_rng(11)
    cfg = vm.VoxelMapConfig(voxel_size=1.0, n_layers=2, capacity_log2=10,
                            layer_init_num=(4, 4), insert_compact=64,
                            descend_compact=128)
    pts = rng.uniform(-6, 6, (500, 3)).astype(np.float32)
    pts[:, 2] = np.round(pts[:, 2]) + 0.01 * rng.standard_normal(500).astype(
        np.float32)
    var = jnp.tile(jnp.eye(3, dtype=jnp.float32) * 1e-4, (500, 1, 1))
    valid = jnp.ones(500, bool)

    m = vm.make_map(cfg)
    for compact in (False, True, True):
        m = vm.update_map(m, jnp.asarray(pts), var, valid, cfg,
                          compact=compact)
        np.testing.assert_allclose(np.asarray(m.rec),
                                   np.asarray(vm.derive_rec(m, cfg)),
                                   rtol=1e-6, atol=1e-6)
    m = vm.slide_map(m, jnp.asarray([0.0, 0.0, 0.0]), 3, cfg)
    np.testing.assert_allclose(np.asarray(m.rec),
                               np.asarray(vm.derive_rec(m, cfg)),
                               rtol=1e-6, atol=1e-6)
