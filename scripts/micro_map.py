"""Micro-timing of update_map internals on the real chip: where do the
milliseconds go — lookup, claims, scatter-add+refit?"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from fast_livo2_tpu.core import voxel_map as vm


def timeit(name, fn, n=20):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    print(f"{name:44s} {(time.perf_counter() - t0) / n * 1e3:8.2f} ms")


def main():
    rng = np.random.default_rng(0)
    N = 8192
    cfg = vm.VoxelMapConfig(voxel_size=0.5, n_layers=3, capacity_log2=18,
                            probes=4, insert_compact=2048)
    scene = rng.uniform(-6, 6, (30000, 3)).astype(np.float32)
    scene[:, 2] = np.round(scene[:, 2])
    m = vm.make_map(cfg)
    var30k = jnp.tile(jnp.eye(3) * 1e-4, (30000, 1, 1))
    m = jax.block_until_ready(
        vm.update_map(m, jnp.asarray(scene), var30k,
                      jnp.ones(30000, bool), cfg))

    pts = jnp.asarray(rng.uniform(-6, 6, (N, 3)).astype(np.float32))
    var6 = jnp.tile(jnp.asarray([1e-4, 0, 0, 1e-4, 0, 1e-4]), (N, 1))
    valid = jnp.ones(N, bool)
    vs = vm.layer_voxel_sizes(cfg)
    keys_L = jnp.floor(pts[None] / vs[:, None, None]).astype(jnp.int32)

    lookup = jax.jit(lambda tabs, k: jax.vmap(
        lambda t, kk: vm._lookup_window(t, kk, cfg.probes))(tabs, k))
    timeit("vmapped lookup_window (3 layers, 8k)",
           lambda: lookup(m.keys, keys_L))
    slot0, found0, empty_rows = lookup(m.keys, keys_L)

    sg = jnp.where(found0, slot0, 0)
    meta = jax.jit(lambda st, rc: (
        jax.vmap(lambda s, g: s[g, 0])(st, sg),
        jax.vmap(lambda r, g: r[g, 0])(rc, sg)))
    timeit("pre-insert meta gathers (cnt+ispl)",
           lambda: meta(m.stats, m.rec))

    unres = jnp.zeros((3, N), bool).at[:, :64].set(~found0[:, :64])

    def claims(tabs):
        def one(tab, keys, tgt, u):
            (li,) = jnp.nonzero(u, size=2048, fill_value=N)
            lic = jnp.minimum(li, N - 1)
            cu = li < N
            tab, cs = vm._claim_rounds(tab, keys[lic], tgt[lic], cu)
            return tab, cs
        return jax.vmap(one)(tabs, keys_L, empty_rows, unres)

    cl = jax.jit(claims)
    timeit("claim rounds (compacted 2048, 3 layers)", lambda: cl(m.keys))

    full = jax.jit(lambda mm: vm.update_map(mm, pts, var6, valid, cfg,
                                            compact=True))
    timeit("update_map full (3 layers, compact)", lambda: full(m))


if __name__ == "__main__":
    main()
