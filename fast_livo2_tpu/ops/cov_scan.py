"""Pallas TPU kernel: sequential covariance propagation P ← F_i P F_iᵀ + Q_i.

The `associative_scan` over (19,19) affine pairs in `core/imu.propagate`
lowers to dozens of micro-kernels (log K levels × slice / concat /
batched-matmul). The recursion only ever needs the FINAL covariance
(`A_all[-1] P A_all[-1]ᵀ + B_all[-1]`), so one Pallas kernel that holds
P in VMEM and runs the K steps sequentially replaces the whole swarm
with a single launch. The covariance recursion itself (reference
IMU_Processing.cpp:377-431) is evaluated exactly — no reassociation.

MEASURED RESULT (v5e via relay, r3): device-time NEUTRAL at K=64 —
both paths complete under the ~24 ms relay round trip that dominates
every sync (kernel ≈ scan ≈ null program when timed with a d2h fence),
and frame-level blocked latency is unchanged (73.4 vs 73.5 ms in the
A/B). The associative swarm was NOT the frame's latency driver; the
kernel is kept as the TPU default because a single launch is robust to
scheduler/launch-latency variance, with `FLV_NO_PALLAS=1` selecting the
scan path for A/B. (Same lesson as ops/pallas_gather.py: this chip's
per-op floors, not kernel internals, set the pace.)

Padding: 19 → 32 host-side with ZEROS (not identity). Zero padding is
exact for this recursion: F_pad P F_padᵀ only populates the top-left
19×19 block, and Q_pad adds zeros elsewhere, so the top-left block
evolves identically to the unpadded recursion.

Numerics note: `core/imu.propagate` composes the affine maps at
jax.lax.Precision.HIGHEST (6-pass bf16). The kernel's
`preferred_element_type=jnp.float32` requests f32 accumulation from the
MXU; equality with the composed path is validated to ~1e-5 relative in
tests/test_imu.py (both are float32 pipelines; the composition ORDER
differs — (∏F) P (∏F)ᵀ + Σ... vs step-wise — which is the same operator
evaluated with different parenthesisation).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAD = 32  # 19 -> 32: MXU/VPU-aligned sublane count


def _kernel(F_ref, Q_ref, P0_ref, out_ref):
    K = F_ref.shape[0]

    def body(i, P):
        Fi = F_ref[pl.ds(i, 1), :, :][0]  # (PAD, PAD)
        Qi = Q_ref[pl.ds(i, 1), :, :][0]
        # precision=HIGHEST: the MXU rounds inputs to bf16 otherwise
        # (measured 2e-2 relative error on the covariance chain — the
        # exact failure mode that diverges the ESIKF, core/pipeline.py
        # precision note). 6-pass bf16 ≈ f32 inputs; the matrices are
        # 32x32, so the extra passes are free at this size.
        FP = jnp.dot(Fi, P, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        FPFt = jax.lax.dot_general(
            FP, Fi, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # FP @ Fi^T
        return FPFt + Qi

    out_ref[:] = jax.lax.fori_loop(0, K, body, P0_ref[:])


@partial(jax.jit, static_argnames=("interpret",))
def propagate_cov(F: jnp.ndarray, Q: jnp.ndarray, P0: jnp.ndarray,
                  interpret: bool = False) -> jnp.ndarray:
    """Final covariance of the recursion P ← F_i P F_iᵀ + Q_i over the
    leading axis. F, Q: (K, D, D); P0: (D, D); returns (D, D)."""
    K, D, _ = F.shape
    f32 = jnp.float32
    Fp = jnp.zeros((K, PAD, PAD), f32).at[:, :D, :D].set(F.astype(f32))
    Qp = jnp.zeros((K, PAD, PAD), f32).at[:, :D, :D].set(Q.astype(f32))
    Pp = jnp.zeros((PAD, PAD), f32).at[:D, :D].set(P0.astype(f32))
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((PAD, PAD), f32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(Fp, Qp, Pp)
    return out[:D, :D].astype(P0.dtype)
