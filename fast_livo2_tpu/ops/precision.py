"""Scoped float32-accumulation for the filter-critical code paths.

`@hi_precision` traces the wrapped function under
jax.default_matmul_precision("highest"). Applied to the IMU propagation /
undistortion and both ESIKF updates (small matrices where the TPU MXU's
bf16 default destroys the filter), NOT to the map-fit eigh pipeline
(gating tolerates the default and "highest" tripled its compile time).
"""

import functools

import jax


def hi_precision(fn):
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)
    return wrapper
