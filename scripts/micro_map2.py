"""Chained-slope phase breakdown of update_map on the real chip (r5
map-insert restructure, VERDICT r4 item 3).

Unlike scripts/micro_map.py (non-chained dispatch loops — includes relay
overhead per call), this uses the roofline methodology: k chained
executions inside one program, scalar-d2h completion, slope k=4..32.
Each phase variant is a full update_map with later phases disabled, so
the slope differences attribute cost to phases under identical XLA
fusion conditions.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import fast_livo2_tpu

fast_livo2_tpu.enable_compile_cache()

from fast_livo2_tpu.core import voxel_map as vm


def _time_scalar(fn, *args, reps=5):
    float(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def slope(step, init, k1=4, k2=32):
    def chained(k):
        @jax.jit
        def run(x):
            x = jax.lax.fori_loop(0, k, step, x)
            return jnp.sum(x[1].stats[0, :8, 0])

        return _time_scalar(run, init)

    t1 = chained(k1)
    t2 = chained(k2)
    return max((t2 - t1) / (k2 - k1), 1e-9) * 1e3


def main():
    rng = np.random.default_rng(0)
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    cfg = vm.VoxelMapConfig(voxel_size=0.5, n_layers=3, capacity_log2=18,
                            probes=8, insert_compact=2048)
    scene = rng.uniform(-6, 6, (30000, 3)).astype(np.float32)
    scene[:, 2] = np.round(scene[:, 2])
    m = vm.make_map(cfg)
    var30k = jnp.tile(jnp.eye(3) * 1e-4, (30000, 1, 1))
    m = jax.block_until_ready(
        vm.update_map(m, jnp.asarray(scene), var30k,
                      jnp.ones(30000, bool), cfg))

    base = jnp.asarray(rng.uniform(-6, 6, (N, 3)).astype(np.float32))
    var6 = jnp.tile(jnp.asarray([1e-4, 0, 0, 1e-4, 0, 1e-4]), (N, 1))
    valid = jnp.ones(N, bool)

    # steady-state-style step: points jitter around the same scene, so
    # nearly all keys exist (the production regime); the fold of rec back
    # into pts chains the dependency.
    def make_step(fn):
        def step(i, carry):
            pts, mm = carry
            mm2 = fn(mm, pts)
            pts2 = base + 1e-4 * mm2.stats[0, :N, 0:1]
            return (pts2, mm2)
        return step

    init = (base, m)

    variants = [
        ("full update_map (compact)",
         lambda mm, pts: vm.update_map(mm, pts, var6, valid, cfg,
                                       compact=True)),
        ("full update_map (no compact)",
         lambda mm, pts: vm.update_map(mm, pts, var6, valid, cfg,
                                       compact=False)),
    ]
    for name, fn in variants:
        print(f"{name:40s} {slope(make_step(fn), init):7.2f} ms")

    # ---- phase isolation: lookup only ----
    vs = vm.layer_voxel_sizes(cfg)

    def lookup_only(i, carry):
        pts, mm = carry
        keys_L = jnp.floor(pts[None] / vs[:, None, None]).astype(jnp.int32)
        slot0, found0, empty_rows = jax.vmap(
            lambda tab, k: vm._lookup_window(tab, k, cfg.probes)
        )(mm.keys, keys_L)
        sg = jnp.where(found0, slot0, 0)
        pre_rec = jax.vmap(lambda rc, s: rc[s])(mm.stats, sg)
        fold = (jnp.sum(pre_rec[:, :, 0], axis=0)
                + empty_rows[0, :, 0].astype(jnp.float32))
        pts2 = base + 1e-4 * fold[:, None]
        return (pts2, mm)

    print(f"{'phase1: lookups+pre_rec only':40s} "
          f"{slope(lookup_only, init):7.2f} ms")

    # ---- phase 1+3 (claims skipped: slots = found only) ----
    def no_claims(i, carry):
        pts, mm = carry
        keys_L = jnp.floor(pts[None] / vs[:, None, None]).astype(jnp.int32)
        slot0, found0, empty_rows = jax.vmap(
            lambda tab, k: vm._lookup_window(tab, k, cfg.probes)
        )(mm.keys, keys_L)
        sg = jnp.where(found0, slot0, 0)
        st_pre = jax.vmap(lambda st, s: st[s])(mm.stats, sg)
        st_pre = jnp.where(found0[..., None], st_pre, 0.0)
        inits = vm.layer_init_nums(cfg)
        hk = vm.layer_has_kids(cfg)
        pre_rec = jax.vmap(
            lambda st, k, v, i2, h: vm._derive_from_stats(st, k, v, i2, h, cfg)
        )(st_pre, keys_L, vs, inits, hk)
        cnt_pre = jnp.where(found0, pre_rec[:, :, vm._CNT], 0.0)
        col_pre = jnp.where(found0, pre_rec[:, :, vm._ISPL], 0.0)
        valid_l = [jnp.ones(N, bool)]
        for li in range(1, cfg.n_layers):
            sub = (found0[li - 1] & (cnt_pre[li - 1] > inits[li - 1])
                   & (col_pre[li - 1] < 0.9))
            valid_l.append(valid_l[-1] & sub)
        valid_L = jnp.stack(valid_l)
        slots = jnp.where(found0, slot0, -1)
        frozen = cnt_pre >= cfg.max_points_num
        ok = valid_L & (slots >= 0) & ~frozen
        stats_new = jax.vmap(
            lambda k, st, sl, o, v: vm._accumulate_layer(k, st, sl, o, v,
                                                         pts, var6)
        )(keys_L, mm.stats, slots, ok, vs)
        mm2 = vm.VoxelMap(keys=mm.keys, stats=stats_new)
        pts2 = base + 1e-4 * mm2.stats[0, :N, 0:1]
        return (pts2, mm2)

    print(f"{'phase1+3 (no claims)':40s} {slope(no_claims, init):7.2f} ms")




def phase3_parts():
    """Isolate phase-3 components: scatter-add, stats readback, eig3
    refit math, rec scatter."""
    rng = np.random.default_rng(0)
    N = 8192
    cfg = vm.VoxelMapConfig(voxel_size=0.5, n_layers=3, capacity_log2=18,
                            probes=8, insert_compact=2048)
    scene = rng.uniform(-6, 6, (30000, 3)).astype(np.float32)
    scene[:, 2] = np.round(scene[:, 2])
    m = vm.make_map(cfg)
    var30k = jnp.tile(jnp.eye(3) * 1e-4, (30000, 1, 1))
    m = jax.block_until_ready(
        vm.update_map(m, jnp.asarray(scene), var30k,
                      jnp.ones(30000, bool), cfg))
    base = jnp.asarray(rng.uniform(-6, 6, (N, 3)).astype(np.float32))
    var6 = jnp.tile(jnp.asarray([1e-4, 0, 0, 1e-4, 0, 1e-4]), (N, 1))
    vs = vm.layer_voxel_sizes(cfg)
    L = cfg.n_layers
    C = 1 << cfg.capacity_log2

    def common(pts, mm):
        keys_L = jnp.floor(pts[None] / vs[:, None, None]).astype(jnp.int32)
        slot0, found0, _ = jax.vmap(
            lambda tab, k: vm._lookup_window(tab, k, cfg.probes)
        )(mm.keys, keys_L)
        return keys_L, jnp.where(found0, slot0, -1)

    def mk(fn):
        def step(i, carry):
            pts, mm = carry
            mm2 = fn(mm, pts)
            pts2 = base + 1e-4 * mm2.stats[0, :N, 0:1]
            return (pts2, mm2)
        return step

    def scatter_add_only(mm, pts):
        keys_L, slots = common(pts, mm)
        def one(keys, stats, slots_l):
            w = jnp.where(slots_l >= 0, slots_l, C)
            voxel_center = (keys.astype(jnp.float32) + 0.5) * 0.5
            p_local = pts - voxel_center
            pp6 = vm.sym6(p_local[:, :, None] * p_local[:, None, :])
            contrib = jnp.concatenate(
                [jnp.ones((N, 1), jnp.float32), p_local, pp6, var6], axis=-1)
            return stats.at[w].add(contrib, mode="drop")
        stats = jax.vmap(one)(keys_L, mm.stats, slots)
        rec = mm.rec.at[0, :N, 21].add(stats[0, :N, 0] * 0.0)
        return vm.VoxelMap(keys=mm.keys, rec=rec, stats=stats)

    def add_and_gather(mm, pts):
        keys_L, slots = common(pts, mm)
        def one(keys, stats, slots_l):
            w = jnp.where(slots_l >= 0, slots_l, C)
            voxel_center = (keys.astype(jnp.float32) + 0.5) * 0.5
            p_local = pts - voxel_center
            pp6 = vm.sym6(p_local[:, :, None] * p_local[:, None, :])
            contrib = jnp.concatenate(
                [jnp.ones((N, 1), jnp.float32), p_local, pp6, var6], axis=-1)
            stats = stats.at[w].add(contrib, mode="drop")
            st16 = stats[jnp.where(slots_l >= 0, slots_l, 0)]
            return stats, st16
        stats, st16 = jax.vmap(one)(keys_L, mm.stats, slots)
        rec = mm.rec.at[0, :N, 21].add(jnp.sum(st16[:, :N, 0], axis=0) * 0.0)
        return vm.VoxelMap(keys=mm.keys, rec=rec, stats=stats)

    def no_eig(mm, pts):
        # full phase 3 but rec written from raw moments (no eig3)
        keys_L, slots = common(pts, mm)
        def one(keys, stats, rec, slots_l, vsize):
            w = jnp.where(slots_l >= 0, slots_l, C)
            voxel_center = (keys.astype(jnp.float32) + 0.5) * vsize
            p_local = pts - voxel_center
            pp6 = vm.sym6(p_local[:, :, None] * p_local[:, None, :])
            contrib = jnp.concatenate(
                [jnp.ones((N, 1), jnp.float32), p_local, pp6, var6], axis=-1)
            stats = stats.at[w].add(contrib, mode="drop")
            st16 = stats[jnp.where(slots_l >= 0, slots_l, 0)]
            rec_update = jnp.concatenate(
                [st16[:, 0:1] * 0.0, st16[:, 1:4], st16[:, 0:1],
                 st16[:, 1:4], st16[:, 0:1],
                 st16[:, 4:10], st16[:, 10:16], st16[:, 0:1]], axis=-1)
            rec = rec.at[w].set(rec_update, mode="drop")
            return stats, rec
        stats, rec = jax.vmap(one, in_axes=(0, 0, 0, 0, 0))(
            keys_L, mm.stats, mm.rec, slots, vs)
        return vm.VoxelMap(keys=mm.keys, rec=rec, stats=stats)

    init = (base, m)
    print(f"{'phase3a: scatter-add only':40s} "
          f"{slope(mk(scatter_add_only), init):7.2f} ms")
    print(f"{'phase3b: scatter-add + stats gather':40s} "
          f"{slope(mk(add_and_gather), init):7.2f} ms")
    print(f"{'phase3c: full phase3 minus eig3':40s} "
          f"{slope(mk(no_eig), init):7.2f} ms")


if __name__ == "__main__":
    if "--parts" in sys.argv:
        phase3_parts()
    else:
        main()
