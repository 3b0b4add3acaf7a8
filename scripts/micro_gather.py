"""Measure gather/scatter access-pattern costs on the real chip, for the
map-insert restructure (VERDICT r4 item 3 / r5 work).

Questions:
  1. Does a probe-window gather (N x P contiguous rows via an (N, P)
     index matrix) cost N*P row-descriptors or ~N (the rows are
     contiguous)?
  2. Does a vmapped dynamic_slice (N starts, (P, W) slices) beat the
     (N, P) index-matrix gather?
  3. How do costs scale with table residency (3 MB cacheable keys table
     vs 23 MB HBM rec table)?
  4. What do scatter-add rows cost vs gather rows?

Methodology = scripts/roofline.py: chained fori_loop with a data
dependency, completion forced by scalar d2h (block_until_ready is
unreliable on this relay), slope between k=4 and k=64 cancels
dispatch/transfer constants.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import fast_livo2_tpu

fast_livo2_tpu.enable_compile_cache()


def _time_scalar(fn, *args, reps=5):
    float(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def per_iter(body, init, k1=4, k2=64):
    def chained(k):
        @jax.jit
        def run(x):
            x = jax.lax.fori_loop(0, k, body, x)
            leaf = x[0] if isinstance(x, tuple) else x
            return jnp.sum(leaf.ravel()[:8].astype(jnp.float32))

        return _time_scalar(run, init)

    t1 = chained(k1)
    t2 = chained(k2)
    return max((t2 - t1) / (k2 - k1), 1e-9) * 1e3  # ms/iter


def main():
    rng = np.random.default_rng(0)
    N = 8192
    P = 8

    for C_log2, label in ((18, "3 MB keys-table"), (21, "24 MB table")):
        C = 1 << C_log2
        tab = jnp.asarray(rng.integers(0, 127, (C, 3), dtype=np.int32))
        h0 = jnp.asarray(rng.integers(0, C - P, (N,), dtype=np.int32))
        offs = jnp.arange(P, dtype=jnp.int32)

        def row_window(i, h, tab=tab, C=C):
            rows = jnp.bitwise_and(h[:, None] + offs[None, :], C - 1)
            w = tab[rows]  # (N, P, 3)
            return jnp.bitwise_and(h * 1103515245 + w[:, 0, 0] + i, C - P - 1)

        def slice_window(i, h, tab=tab, C=C):
            w = jax.vmap(
                lambda s: jax.lax.dynamic_slice(tab, (s, 0), (P, 3))
            )(h)
            return jnp.bitwise_and(h * 1103515245 + w[:, 0, 0] + i, C - P - 1)

        def one_row(i, h, tab=tab, C=C):
            w = tab[h]
            return jnp.bitwise_and(h * 1103515245 + w[:, 0] + i, C - P - 1)

        t_win = per_iter(row_window, h0)
        t_sl = per_iter(slice_window, h0)
        t_one = per_iter(one_row, h0)
        print(f"[{label}] C=2^{C_log2} N={N} P={P}")
        print(f"  (N,P) index-matrix window gather  {t_win:7.3f} ms "
              f"({t_win * 1e6 / (N * P):5.1f} ns/row)")
        print(f"  vmapped dynamic_slice window      {t_sl:7.3f} ms")
        print(f"  single-row gather (N rows)        {t_one:7.3f} ms "
              f"({t_one * 1e6 / N:5.1f} ns/row)")

    # fat f32 rec-style table: single-row gather + full-row scatter
    C = 1 << 18
    rec = jnp.asarray(rng.standard_normal((C, 22)).astype(np.float32))
    h0 = jnp.asarray(rng.integers(0, C - P, (N,), dtype=np.int32))

    def rec_gather(i, carry):
        h, acc = carry
        w = rec[h]
        h2 = jnp.bitwise_and(
            h * 1103515245 + w[:, 0].astype(jnp.int32) + i, C - 1)
        return (h2, acc + w[:, 1])

    def rec_scatter(i, carry):
        h, acc = carry
        r = jnp.zeros((C, 22), jnp.float32).at[h].add(
            jnp.ones((N, 22), jnp.float32))
        w = r[h]
        h2 = jnp.bitwise_and(
            h * 1103515245 + w[:, 0].astype(jnp.int32) + i, C - 1)
        return (h2, acc + w[:, 1])

    t_g = per_iter(rec_gather, (h0, jnp.zeros(N)))
    t_s = per_iter(rec_scatter, (h0, jnp.zeros(N)))
    print(f"[22-wide f32 rec 23 MB]")
    print(f"  single-row gather (N rows)        {t_g:7.3f} ms "
          f"({t_g * 1e6 / N:5.1f} ns/row)")
    print(f"  scatter-add+gather (fresh zeros)  {t_s:7.3f} ms")


if __name__ == "__main__":
    main()
