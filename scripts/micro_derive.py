"""Cost of deriving the plane record from raw moments in registers
(the rec-free map design): full _refit_layer math minus scatters, at
match scale ((L+1) x N candidate lanes)."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import fast_livo2_tpu

fast_livo2_tpu.enable_compile_cache()

from fast_livo2_tpu.core import voxel_map as vm
from fast_livo2_tpu.ops import eig3


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


def derive(st16, threshold=0.0025, init_num=5.0):
    """Plane record from one gathered stats row (pure register math)."""
    n = st16[..., 0]
    n_safe = jnp.maximum(n, 1.0)
    st = st16[..., 1:]
    mean_local = st[..., 0:3] / n_safe[..., None]
    cov6 = st[..., 3:9] / n_safe[..., None] - vm.sym6(
        mean_local[..., :, None] * mean_local[..., None, :])
    cov = vm.sym6_to_mat(cov6) + jnp.eye(3) * 1e-9
    evals, evecs = eig3.eigh3(cov)
    lam0, lam1, lam2 = evals[..., 0], evals[..., 1], evals[..., 2]
    enough = n > init_num
    fits = lam0 < threshold
    is_plane = jnp.where(fits & enough, 1.0, 0.0)
    center = mean_local
    normal = evecs[..., :, 0]
    d = -jnp.sum(normal * center, axis=-1)
    radius = jnp.sqrt(jnp.clip(lam2, 0.0, None))
    C_bar6 = st[..., 9:15] / n_safe[..., None]
    sigma2 = (C_bar6[..., 0] + C_bar6[..., 3] + C_bar6[..., 5]) / 3.0
    dmin = 1e-6
    d1 = (lam1 + lam0) / (n_safe * jnp.maximum((lam0 - lam1) ** 2, dmin))
    d2 = (lam2 + lam0) / (n_safe * jnp.maximum((lam0 - lam2) ** 2, dmin))
    D = jnp.zeros_like(evals).at[..., 1].set(d1).at[..., 2].set(d2)
    cov_nn = sigma2[..., None, None] * jnp.einsum(
        "...ik,...k,...jk->...ij", evecs, D, evecs)
    return (is_plane, normal, d, center, radius,
            vm.sym6(cov_nn), C_bar6 / n_safe[..., None])


def main():
    rng = np.random.default_rng(0)
    for lanes in (8192, 4 * 8192, 16 * 8192):
        st0 = jnp.asarray(
            np.abs(rng.standard_normal((lanes, 16))).astype(np.float32))
        st0 = st0.at[:, 0].set(
            jnp.asarray(rng.integers(1, 60, (lanes,)).astype(np.float32)))

        def step(i, carry):
            st, acc = carry
            out = derive(st)
            fold = out[2] + out[0]
            return (st.at[:, 1].add(1e-6 * fold), acc + fold)

        init = (st0, jnp.zeros(lanes))
        t = slope(step, init)
        print(f"derive full plane record, {lanes:6d} lanes: {t:7.3f} ms")


if __name__ == "__main__":
    main()
