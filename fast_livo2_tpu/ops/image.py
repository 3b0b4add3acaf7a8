"""Batched image sampling primitives for the sparse-direct VIO.

Replaces the reference's pointer-striding patch loops
(getImagePatch vio.cpp:203-225, the gradient/residual sampling of
updateState vio.cpp:1580-1630, vk::shiTomasiScore, vk::interpolateMat_8u)
with gather-based batched ops over (N, patch²) index tensors.

Sampling convention (faithful to the reference): a patch at "scale" s
(s = 2^(pyramid+search level)) reads the *level-0* image at s-strided
offsets around floor(px/s)*s, bilinearly weighted by the sub-pixel
fraction of px/s — i.e. bilinear interpolation on the s-decimated grid,
not on an averaged pyramid.
"""

import jax.numpy as jnp


def _gather(img: jnp.ndarray, xi: jnp.ndarray, yi: jnp.ndarray) -> jnp.ndarray:
    """img (H, W) float32, integer coords (clamped); xi=column, yi=row."""
    h, w = img.shape
    xi = jnp.clip(xi, 0, w - 1)
    yi = jnp.clip(yi, 0, h - 1)
    return img[yi, xi]


def patch_offsets(patch_size: int):
    """(patch², 2) integer (dx, dy) offsets, row-major like the reference
    patch layout (x = row index, y = column index in vio.cpp:216-224)."""
    half = patch_size // 2
    dy, dx = jnp.meshgrid(
        jnp.arange(patch_size) - half, jnp.arange(patch_size) - half, indexing="ij"
    )
    return dx.reshape(-1), dy.reshape(-1)  # column, row offsets


def sample_patches(img: jnp.ndarray, px: jnp.ndarray, scale: jnp.ndarray,
                   patch_size: int):
    """Sample (N, patch²) strided patches at centers px (N, 2).

    scale: (N,) int32 stride (1 << level). Mirrors getImagePatch
    (vio.cpp:203-225).
    """
    ps, half = patch_size, patch_size // 2
    sp, su, sv = _superpatch(img, px, scale, ps + 1, lo=-half)
    w_tl = ((1 - su) * (1 - sv))[:, None, None]
    w_tr = (su * (1 - sv))[:, None, None]
    w_bl = ((1 - su) * sv)[:, None, None]
    w_br = (su * sv)[:, None, None]
    return (
        w_tl * sp[:, :ps, :ps] + w_tr * sp[:, :ps, 1:]
        + w_bl * sp[:, 1:, :ps] + w_br * sp[:, 1:, 1:]
    ).reshape(px.shape[0], ps * ps)


def _superpatch(img: jnp.ndarray, px: jnp.ndarray, scale: jnp.ndarray,
                size: int, lo: int, img_idx=None):
    """One fused gather of an s-strided (size x size) neighborhood per
    point: SP[n, l, k] = img(y0 + (l+lo)*s, x0 + (k+lo)*s). Replaces the
    4-gathers-per-bilinear pattern — the photometric iteration was
    dispatch-bound on ~20 small gathers, not bandwidth.

    img may be a stack (F, H, W) with per-point indices `img_idx` (N,)."""
    u, v = px[:, 0], px[:, 1]
    s = scale.astype(jnp.float32)
    ui = (jnp.floor(u / s) * s).astype(jnp.int32)
    vi = (jnp.floor(v / s) * s).astype(jnp.int32)
    su = (u.astype(jnp.float32) - ui) / s
    sv = (v.astype(jnp.float32) - vi) / s
    rng = (jnp.arange(size, dtype=jnp.int32) + lo)[None, :] * scale[:, None]
    h, w = img.shape[-2:]
    xi = jnp.clip(ui[:, None] + rng, 0, w - 1)  # (N, size)
    yi = jnp.clip(vi[:, None] + rng, 0, h - 1)
    if img_idx is None:
        sp = img[yi[:, :, None], xi[:, None, :]]  # (N, size, size)
    else:
        sp = img[img_idx[:, None, None], yi[:, :, None], xi[:, None, :]]
    return sp, su, sv


def sample_patches_with_grad(img: jnp.ndarray, px: jnp.ndarray, scale: jnp.ndarray,
                             patch_size: int, img_idx=None):
    """Patch values + strided central-difference gradients (du, dv), the
    hot sampling of updateState (vio.cpp:1595-1620). Returns three
    (N, patch²) arrays; gradients are in *scaled* pixel units (the 1/scale
    factor of :1613 is applied by the caller's Jacobian chain)."""
    ps, half = patch_size, patch_size // 2
    size = ps + 4  # offsets -half-1 .. half+2 relative to the base corner
    sp, su, sv = _superpatch(img, px, scale, size, lo=-half - 1, img_idx=img_idx)
    w_tl = ((1 - su) * (1 - sv))[:, None, None]
    w_tr = (su * (1 - sv))[:, None, None]
    w_bl = ((1 - su) * sv)[:, None, None]
    w_br = (su * sv)[:, None, None]

    def bil(r0, c0):
        """Bilinear values for the ps x ps patch whose top-left corner sits
        at superpatch row r0 / col c0."""
        block = sp[:, r0:r0 + ps + 1, c0:c0 + ps + 1]
        return (
            w_tl * block[:, :ps, :ps] + w_tr * block[:, :ps, 1:]
            + w_bl * block[:, 1:, :ps] + w_br * block[:, 1:, 1:]
        ).reshape(px.shape[0], ps * ps)

    val = bil(1, 1)
    du = 0.5 * (bil(1, 2) - bil(1, 0))
    dv = 0.5 * (bil(2, 1) - bil(0, 1))
    return val, du, dv


def bilinear(img: jnp.ndarray, px: jnp.ndarray) -> jnp.ndarray:
    """Plain bilinear sample at float pixel coords (..., 2)
    (vk::interpolateMat_8u)."""
    u, v = px[..., 0], px[..., 1]
    x0 = jnp.floor(u).astype(jnp.int32)
    y0 = jnp.floor(v).astype(jnp.int32)
    su = u - x0
    sv = v - y0
    tl = _gather(img, x0, y0)
    tr = _gather(img, x0 + 1, y0)
    bl = _gather(img, x0, y0 + 1)
    br = _gather(img, x0 + 1, y0 + 1)
    return (1 - su) * (1 - sv) * tl + su * (1 - sv) * tr + (1 - su) * sv * bl + su * sv * br


def box_stack(img: jnp.ndarray, n_levels: int) -> jnp.ndarray:
    """(L, H, W) stack of aligned box means: level l pixel (y, x) is the
    mean of img over [y, y+2^l) x [x, x+2^l). Because the strided
    samplers above only tap coordinates that are multiples of the
    per-point stride s = 2^l, gathering level l of this stack reproduces
    bilinear interpolation on a vk::halfSample image pyramid EXACTLY
    (pyramid pixel k = aligned 2^l-block mean = stack[l, k*s, k*s]).

    This is the anti-aliased "true pyramid" option A/B'd against the
    reference-faithful raw strided sampling (the reference's updateState
    walks the LEVEL-0 image with scale-strided pointers,
    vio.cpp:1596-1627; its createImgPyramid (frame.cpp:54-63) is present
    but never called — no code reads img_pyr_). Built with integral
    images: O(L*H*W), no gathers.
    """
    lvls = [img]
    for l in range(1, n_levels):
        s_ = 1 << l
        lvls.append(_box_sum(img, 0, s_ - 1) / float(s_ * s_))
    return jnp.stack(lvls)


def _box_sum(a: jnp.ndarray, lo: int, hi: int) -> jnp.ndarray:
    """S[y, x] = sum of a over the window [y+lo, y+hi] x [x+lo, x+hi]
    (inclusive), with clamped (edge-replicated) out-of-range taps — via
    integral images, O(HW) with no gathers."""
    pl, ph = -lo, hi
    ap = jnp.pad(a, ((pl, ph), (pl, ph)), mode="edge")
    ii = jnp.cumsum(jnp.cumsum(ap, axis=0), axis=1)
    ii = jnp.pad(ii, ((1, 0), (1, 0)))
    w = hi - lo + 1
    h_, w_ = a.shape
    # window for pixel p covers padded rows [p, p+w-1] -> ii[p+w] - ii[p]
    return (
        ii[w:w + h_, w:w + w_] - ii[:h_, w:w + w_]
        - ii[w:w + h_, :w_] + ii[:h_, :w_]
    )


def shi_tomasi_image(img: jnp.ndarray, halfbox: int = 4) -> jnp.ndarray:
    """Dense Shi-Tomasi score image: min eigenvalue of the averaged
    gradient structure tensor over a (2*halfbox)² box at every pixel.
    Shift-based gradients + integral-image box sums keep this entirely on
    the vector unit — scoring every pixel densely is ~20x cheaper than
    gathering 4 x 64 taps for each of ~8k candidate points."""
    imgp = jnp.pad(img, ((1, 1), (1, 1)), mode="edge")
    dx = 0.5 * (imgp[1:-1, 2:] - imgp[1:-1, :-2])
    dy = 0.5 * (imgp[2:, 1:-1] - imgp[:-2, 1:-1])
    box = 2 * halfbox
    npix = box * box
    # patch_offsets(box) spans [-halfbox, halfbox-1] in both dims.
    dxx = _box_sum(dx * dx, -halfbox, halfbox - 1) / npix
    dyy = _box_sum(dy * dy, -halfbox, halfbox - 1) / npix
    dxy = _box_sum(dx * dy, -halfbox, halfbox - 1) / npix
    tr = dxx + dyy
    det = dxx * dyy - dxy * dxy
    return 0.5 * (tr - jnp.sqrt(jnp.clip(tr * tr - 4 * det, 0.0, None)))


def shi_tomasi(img: jnp.ndarray, px: jnp.ndarray, halfbox: int = 4) -> jnp.ndarray:
    """Shi-Tomasi corner score at (N, 2) integer-ish pixel locations
    (vk::shiTomasiScore as used at vio.cpp:822): one gather from the
    dense score image."""
    score = shi_tomasi_image(img, halfbox)
    return _gather(score, px[:, 0].astype(jnp.int32), px[:, 1].astype(jnp.int32))
