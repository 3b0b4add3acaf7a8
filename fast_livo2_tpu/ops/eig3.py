"""Closed-form eigendecomposition of batched symmetric 3x3 matrices.

Replaces `jnp.linalg.eigh` in the voxel plane-fit path: XLA's general
eigh lowers to an iterative QR pipeline that dominated both compile and
run time for (N, 3, 3) batches; the 3x3 symmetric case has an analytic
solution (trigonometric eigenvalues via matrix invariants, eigenvectors
via cross products) that is pure VPU element-wise math.

Numerics: inputs are pre-scaled by their Frobenius norm; eigenvectors for
(near-)degenerate pairs are completed by Gram-Schmidt against the unique
eigenvector, which is all the plane fit needs (any orthobasis of a
degenerate subspace is equally valid for scatter analysis).
Returns eigenvalues ascending, matching jnp.linalg.eigh's convention.
"""

import jax.numpy as jnp


def _row_cross(a, b):
    return jnp.cross(a, b, axis=-1)


def eigh3(A):
    """A: (..., 3, 3) symmetric. Returns (evals (..., 3) ascending,
    evecs (..., 3, 3) with evecs[..., :, k] the k-th eigenvector)."""
    # Scale for conditioning.
    scale = jnp.sqrt(jnp.sum(A * A, axis=(-2, -1), keepdims=True)) + 1e-30
    B = A / scale

    a00 = B[..., 0, 0]
    a11 = B[..., 1, 1]
    a22 = B[..., 2, 2]
    a01 = B[..., 0, 1]
    a02 = B[..., 0, 2]
    a12 = B[..., 1, 2]

    q = (a00 + a11 + a22) / 3.0
    p1 = a01 * a01 + a02 * a02 + a12 * a12
    d0, d1, d2 = a00 - q, a11 - q, a22 - q
    p2 = d0 * d0 + d1 * d1 + d2 * d2 + 2.0 * p1
    p = jnp.sqrt(jnp.clip(p2 / 6.0, 1e-30, None))
    # C = (B - q I) / p ; eigenvalues of C are 2 cos(theta + 2k pi/3)
    c00, c11, c22 = d0 / p, d1 / p, d2 / p
    c01, c02, c12 = a01 / p, a02 / p, a12 / p
    detC = (
        c00 * (c11 * c22 - c12 * c12)
        - c01 * (c01 * c22 - c12 * c02)
        + c02 * (c01 * c12 - c11 * c02)
    )
    r = jnp.clip(detC / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    lam2 = q + 2.0 * p * jnp.cos(phi)                      # largest
    lam0 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)  # smallest
    lam1 = 3.0 * q - lam0 - lam2
    evals = jnp.stack([lam0, lam1, lam2], axis=-1)

    # Eigenvector for eigenvalue l: cross of two rows of (B - l I) spans
    # the null space. Pick the most independent cross product.
    def evec(l):
        r0 = jnp.stack([a00 - l, a01, a02], axis=-1)
        r1 = jnp.stack([a01, a11 - l, a12], axis=-1)
        r2 = jnp.stack([a02, a12, a22 - l], axis=-1)
        c01_ = _row_cross(r0, r1)
        c02_ = _row_cross(r0, r2)
        c12_ = _row_cross(r1, r2)
        n01 = jnp.sum(c01_ * c01_, axis=-1)
        n02 = jnp.sum(c02_ * c02_, axis=-1)
        n12 = jnp.sum(c12_ * c12_, axis=-1)
        best01 = (n01 >= n02) & (n01 >= n12)
        best02 = (~best01) & (n02 >= n12)
        v = jnp.where(
            best01[..., None], c01_,
            jnp.where(best02[..., None], c02_, c12_),
        )
        n = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
        return v / jnp.clip(n, 1e-30, None), n[..., 0]

    v0, n0 = evec(lam0)
    v2, n2 = evec(lam2)
    # Use the better-conditioned of the two extreme eigenvectors as the
    # anchor; rebuild the other two orthogonally.
    use0 = n0 >= n2
    anchor = jnp.where(use0[..., None], v0, v2)
    # Fully degenerate (isotropic) input: all row crosses vanish; any
    # orthonormal basis is an eigenbasis — anchor on e_x.
    degen = jnp.maximum(n0, n2) < 1e-20
    anchor = jnp.where(
        degen[..., None],
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), anchor.shape),
        anchor,
    )
    # helper orthogonal to anchor
    h = jnp.where(
        (jnp.abs(anchor[..., 0:1]) < 0.9),
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), anchor.shape),
        jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), anchor.shape),
    )
    u = _row_cross(anchor, h)
    u = u / jnp.clip(jnp.linalg.norm(u, axis=-1, keepdims=True), 1e-30, None)
    w = _row_cross(anchor, u)
    # middle eigenvector: apply B in the {u, w} plane and diagonalize 2x2
    Bu = jnp.einsum("...ij,...j->...i", B, u)
    Bw = jnp.einsum("...ij,...j->...i", B, w)
    buu = jnp.sum(u * Bu, axis=-1)
    bww = jnp.sum(w * Bw, axis=-1)
    buw = jnp.sum(u * Bw, axis=-1)
    ang = 0.5 * jnp.arctan2(2.0 * buw, buu - bww)
    ca, sa = jnp.cos(ang)[..., None], jnp.sin(ang)[..., None]
    e1 = ca * u + sa * w
    e2 = -sa * u + ca * w
    # Of (e1, e2): the one with the larger Rayleigh quotient pairs with the
    # larger remaining eigenvalue.
    q1 = jnp.sum(e1 * jnp.einsum("...ij,...j->...i", B, e1), axis=-1)
    q2 = jnp.sum(e2 * jnp.einsum("...ij,...j->...i", B, e2), axis=-1)
    hi_first = q1 >= q2
    ehi = jnp.where(hi_first[..., None], e1, e2)
    elo = jnp.where(hi_first[..., None], e2, e1)
    # Anchored at v_min: remaining pair is (mid, max) -> mid = elo.
    # Anchored at v_max: remaining pair is (min, mid) -> mid = ehi.
    vec_min = jnp.where(use0[..., None], anchor, elo)
    vec_mid = jnp.where(use0[..., None], elo, ehi)
    vec_max = jnp.where(use0[..., None], ehi, anchor)
    evecs = jnp.stack([vec_min, vec_mid, vec_max], axis=-1)
    return evals * scale[..., 0, 0][..., None], evecs
