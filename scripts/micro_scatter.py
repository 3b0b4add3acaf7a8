"""Scatter cost model on the real chip: how does scatter-add/set cost
scale with rows, width, uniqueness hints? Decides the map-insert
restructure (r5)."""

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
    C = 1 << 18

    for N in (8192, 2048):
        idx0 = jnp.asarray(
            rng.integers(0, C, (N,), dtype=np.int32))
        for W in (16, 4):
            tab0 = jnp.zeros((C, W), jnp.float32)
            contrib = jnp.ones((N, W), jnp.float32)

            def sc_add(i, carry):
                tab, idx = carry
                tab = tab.at[idx].add(contrib, mode="drop")
                idx2 = jnp.bitwise_and(
                    idx * 1103515245 + 12345 + i, C - 1)
                return (tab, idx2)

            def sc_add_uniq(i, carry):
                tab, idx = carry
                tab = tab.at[idx].add(contrib, mode="drop",
                                      unique_indices=True)
                idx2 = jnp.bitwise_and(
                    idx * 1103515245 + 12345 + i, C - 1)
                return (tab, idx2)

            def sc_set(i, carry):
                tab, idx = carry
                tab = tab.at[idx].set(contrib, mode="drop")
                idx2 = jnp.bitwise_and(
                    idx * 1103515245 + 12345 + i, C - 1)
                return (tab, idx2)

            def sc_set_uniq(i, carry):
                tab, idx = carry
                tab = tab.at[idx].set(contrib, mode="drop",
                                      unique_indices=True)
                idx2 = jnp.bitwise_and(
                    idx * 1103515245 + 12345 + i, C - 1)
                return (tab, idx2)

            init = (tab0, idx0)
            ta = slope(sc_add, init)
            tau = slope(sc_add_uniq, init)
            ts = slope(sc_set, init)
            tsu = slope(sc_set_uniq, init)
            print(f"N={N:6d} W={W:3d}  add {ta:6.2f}  add(uniq) {tau:6.2f}"
                  f"  set {ts:6.2f}  set(uniq) {tsu:6.2f} ms"
                  f"   [{ta * 1e6 / N:.0f} ns/row add]")

    # scalar scatter-max (the claim/leader-election primitive)
    N = 8192
    idx0 = jnp.asarray(rng.integers(0, C, (N,), dtype=np.int32))
    lane = jnp.arange(N, dtype=jnp.int32)

    def sc_max(i, carry):
        tab, idx = carry
        tab = jnp.full((C,), -1, jnp.int32).at[idx].max(lane, mode="drop")
        idx2 = jnp.bitwise_and(idx * 1103515245 + tab[idx] + i, C - 1)
        return (tab.astype(jnp.float32), idx2)

    init = (jnp.zeros((C,), jnp.float32), idx0)
    print(f"scatter-max 1-wide N={N}: {slope(sc_max, init):6.2f} ms")

    # eig3 on N lanes
    from fast_livo2_tpu.ops import eig3
    A0 = jnp.asarray(rng.standard_normal((N, 3, 3)).astype(np.float32))
    A0 = A0 @ jnp.swapaxes(A0, -1, -2) + jnp.eye(3) * 1e-3

    def eig_step(i, carry):
        A, acc = carry
        evals, evecs = eig3.eigh3(A)
        return (A + 1e-6 * evals[:, :, None] * jnp.eye(3), acc + evals[:, 0])

    init = (A0, jnp.zeros(N))
    print(f"eig3.eigh3 N={N}:        {slope(eig_step, init):6.2f} ms")


if __name__ == "__main__":
    main()
