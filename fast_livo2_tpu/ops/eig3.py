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


def eigh3_cols(a00, a01, a02, a11, a12, a22):
    """eigh3 on UNPACKED symmetric components — every operand and result
    is a plain (...,) float array, no stacked (..., 3, 3) tensors.

    Same math and conventions as eigh3 (Frobenius pre-scaling, trig
    eigenvalues, cross-product eigenvectors with degenerate completion;
    eigenvalues ascending), but expressed column-wise so XLA fuses the
    whole decomposition into one elementwise kernel over the batch. The
    packed eigh3 interleaves stack/cross/einsum layout changes that
    break fusion: at full-table scale (786k lanes) the packed form
    measured ~100 ms of unfused HBM streams where this form runs at the
    output-bandwidth floor (the voxel map's rec-cache refresh is the
    consumer — core/voxel_map._derive_from_stats).

    Returns (l0, l1, l2, v0, v1, v2) with l ascending and each v a
    3-tuple of component arrays; v0 is the eigenvector of l0.
    """
    scale = jnp.sqrt(
        a00 * a00 + a11 * a11 + a22 * a22
        + 2.0 * (a01 * a01 + a02 * a02 + a12 * a12)
    ) + 1e-30
    a00, a01, a02 = a00 / scale, a01 / scale, a02 / scale
    a11, a12, a22 = a11 / scale, a12 / scale, a22 / scale

    q = (a00 + a11 + a22) / 3.0
    p1 = a01 * a01 + a02 * a02 + a12 * a12
    d0, d1, d2 = a00 - q, a11 - q, a22 - q
    p2 = d0 * d0 + d1 * d1 + d2 * d2 + 2.0 * p1
    p = jnp.sqrt(jnp.clip(p2 / 6.0, 1e-30, None))
    c00, c11, c22 = d0 / p, d1 / p, d2 / p
    c01, c02, c12 = a01 / p, a02 / p, a12 / p
    detC = (
        c00 * (c11 * c22 - c12 * c12)
        - c01 * (c01 * c22 - c12 * c02)
        + c02 * (c01 * c12 - c11 * c02)
    )
    r = jnp.clip(detC / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    lam2 = q + 2.0 * p * jnp.cos(phi)
    lam0 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    lam1 = 3.0 * q - lam0 - lam2

    def evec(l):
        # rows of (B - l I): r0 = (a00-l, a01, a02), r1 = (a01, a11-l,
        # a12), r2 = (a02, a12, a22-l); candidate null vectors = the
        # three pairwise row crosses, componentwise.
        b00, b11, b22 = a00 - l, a11 - l, a22 - l
        x01 = a01 * a12 - a02 * b11
        y01 = a02 * a01 - b00 * a12
        z01 = b00 * b11 - a01 * a01
        x02 = a01 * b22 - a02 * a12
        y02 = a02 * a02 - b00 * b22
        z02 = b00 * a12 - a01 * a02
        x12 = b11 * b22 - a12 * a12
        y12 = a12 * a02 - a01 * b22
        z12 = a01 * a12 - b11 * a02
        n01 = x01 * x01 + y01 * y01 + z01 * z01
        n02 = x02 * x02 + y02 * y02 + z02 * z02
        n12 = x12 * x12 + y12 * y12 + z12 * z12
        best01 = (n01 >= n02) & (n01 >= n12)
        best02 = (~best01) & (n02 >= n12)

        def sel(u01, u02, u12):
            return jnp.where(best01, u01, jnp.where(best02, u02, u12))

        vx, vy, vz = sel(x01, x02, x12), sel(y01, y02, y12), sel(z01, z02, z12)
        nrm = jnp.sqrt(vx * vx + vy * vy + vz * vz)
        inv = 1.0 / jnp.clip(nrm, 1e-30, None)
        return (vx * inv, vy * inv, vz * inv), nrm

    (v0x, v0y, v0z), n0 = evec(lam0)
    (v2x, v2y, v2z), n2 = evec(lam2)
    use0 = n0 >= n2
    ax = jnp.where(use0, v0x, v2x)
    ay = jnp.where(use0, v0y, v2y)
    az = jnp.where(use0, v0z, v2z)
    degen = jnp.maximum(n0, n2) < 1e-20
    ax = jnp.where(degen, 1.0, ax)
    ay = jnp.where(degen, 0.0, ay)
    az = jnp.where(degen, 0.0, az)
    # helper orthogonal to the anchor: e_x where |anchor_x| < 0.9 else e_y
    small = jnp.abs(ax) < 0.9
    hx = jnp.where(small, 1.0, 0.0)
    hy = jnp.where(small, 0.0, 1.0)
    # u = anchor x h, normalized
    ux = ay * 0.0 - az * hy
    uy = az * hx - ax * 0.0
    uz = ax * hy - ay * hx
    uinv = 1.0 / jnp.clip(jnp.sqrt(ux * ux + uy * uy + uz * uz), 1e-30, None)
    ux, uy, uz = ux * uinv, uy * uinv, uz * uinv
    # w = anchor x u
    wx = ay * uz - az * uy
    wy = az * ux - ax * uz
    wz = ax * uy - ay * ux

    def bmul(x, y, z):
        return (a00 * x + a01 * y + a02 * z,
                a01 * x + a11 * y + a12 * z,
                a02 * x + a12 * y + a22 * z)

    Bux, Buy, Buz = bmul(ux, uy, uz)
    Bwx, Bwy, Bwz = bmul(wx, wy, wz)
    buu = ux * Bux + uy * Buy + uz * Buz
    bww = wx * Bwx + wy * Bwy + wz * Bwz
    buw = ux * Bwx + uy * Bwy + uz * Bwz
    ang = 0.5 * jnp.arctan2(2.0 * buw, buu - bww)
    ca, sa = jnp.cos(ang), jnp.sin(ang)
    e1x, e1y, e1z = ca * ux + sa * wx, ca * uy + sa * wy, ca * uz + sa * wz
    e2x, e2y, e2z = -sa * ux + ca * wx, -sa * uy + ca * wy, -sa * uz + ca * wz
    B1x, B1y, B1z = bmul(e1x, e1y, e1z)
    B2x, B2y, B2z = bmul(e2x, e2y, e2z)
    q1 = e1x * B1x + e1y * B1y + e1z * B1z
    q2 = e2x * B2x + e2y * B2y + e2z * B2z
    hi_first = q1 >= q2

    def pick(cond, t, f):
        return tuple(jnp.where(cond, a, b) for a, b in zip(t, f))

    ehi = pick(hi_first, (e1x, e1y, e1z), (e2x, e2y, e2z))
    elo = pick(hi_first, (e2x, e2y, e2z), (e1x, e1y, e1z))
    anchor = (ax, ay, az)
    vec_min = pick(use0, anchor, elo)
    vec_mid = pick(use0, elo, ehi)
    vec_max = pick(use0, ehi, anchor)
    return (lam0 * scale, lam1 * scale, lam2 * scale,
            vec_min, vec_mid, vec_max)
