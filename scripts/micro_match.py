"""Chained-slope cost of match_planes variants (r5 LIO regression
isolation): in-register derive (current) vs gathering a pre-derived rec
table, and the cost of a full-table rec derivation stream."""

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
            leaf = x[0] if isinstance(x, tuple) else x
            return jnp.sum(leaf.ravel()[:8])

        return _time_scalar(run, init)

    return max((chained(k2) - chained(k1)) / (k2 - k1), 1e-9) * 1e3


def main():
    rng = np.random.default_rng(0)
    N = 8192
    cfg = vm.VoxelMapConfig(voxel_size=0.5, n_layers=3, capacity_log2=18,
                            probes=8, insert_compact=2048)
    scene = rng.uniform(-6, 6, (30000, 3)).astype(np.float32)
    scene[:, 2] = np.round(scene[:, 2])
    m = vm.make_map(cfg)
    var30k = jnp.tile(jnp.eye(3) * 1e-4, (30000, 1, 1))
    for _ in range(3):
        m = vm.update_map(m, jnp.asarray(scene), var30k,
                          jnp.ones(30000, bool), cfg)
    m = jax.block_until_ready(m)

    base = jnp.asarray(rng.uniform(-6, 6, (N, 3)).astype(np.float32))
    var6 = jnp.tile(jnp.asarray([1e-4, 0, 0, 1e-4, 0, 1e-4]), (N, 1))
    valid = jnp.ones(N, bool)

    def match_step(i, carry):
        pts, acc = carry
        mt = vm.match_planes(m, pts, var6, valid, cfg)
        fold = jnp.where(mt.valid, mt.dist, 0.0)
        return (base + 1e-5 * fold[:, None], acc + fold)

    init = (base, jnp.zeros(N))
    print(f"match_planes (derive in registers)   "
          f"{slope(match_step, init):7.2f} ms")

    # full-table rec derivation stream
    def derive_step(i, carry):
        x, acc = carry
        rec = vm.derive_rec(m, cfg)
        return (x + 1e-9 * rec[0, :8, 0].sum(), acc + rec[0, 0, 0])

    init2 = (jnp.zeros(8), jnp.zeros(()))
    print(f"derive_rec full table (L*C lanes)    "
          f"{slope(derive_step, init2):7.2f} ms")

    # match against a pre-derived rec table (the r4-style read path):
    rec_tab = jax.block_until_ready(vm.derive_rec(m, cfg))

    def match_pre(i, carry):
        pts, acc = carry
        vsizes = vm.layer_voxel_sizes(cfg)
        keys_L = jnp.floor(
            pts[None, :, :] / vsizes[:, None, None]).astype(jnp.int32)
        center0 = (keys_L[0].astype(jnp.float32) + 0.5) * vsizes[0]
        off = pts - center0
        q = vsizes[0] / 4.0
        shift = jnp.where(off > q, 1,
                          jnp.where(off < -q, -1, 0)).astype(jnp.int32)
        keys_all = jnp.concatenate([keys_L, (keys_L[0] + shift)[None]], 0)
        idx = jnp.asarray([0, 1, 2, 0])
        ktabs = m.keys[idx]
        rtabs = rec_tab[idx]

        def one(keys_tab, rec_t, keys):
            slot, found, _ = vm._lookup_window(keys_tab, keys, cfg.probes)
            rec = rec_t[jnp.where(found, slot, 0)]
            rec = jnp.where(found[:, None], rec, 0.0)
            return vm._gate(rec, found, pts, var6, cfg)[3][:, 7]

        dists = jax.vmap(one)(ktabs, rtabs, keys_all)
        fold = dists.sum(0)
        return (base + 1e-6 * fold[:, None], acc + fold)

    print(f"match vs pre-derived rec table       "
          f"{slope(match_pre, init):7.2f} ms")


if __name__ == "__main__":
    main()
