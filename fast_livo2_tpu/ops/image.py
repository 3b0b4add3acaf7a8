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
    dx, dy = patch_offsets(patch_size)  # (P,)
    u, v = px[:, 0], px[:, 1]
    s = scale.astype(jnp.float32)
    ui = jnp.floor(u / s) * s
    vi = jnp.floor(v / s) * s
    su = (u - ui) / s
    sv = (v - vi) / s
    w_tl = (1 - su) * (1 - sv)
    w_tr = su * (1 - sv)
    w_bl = (1 - su) * sv
    w_br = su * sv

    sc = scale[:, None]
    x0 = (ui.astype(jnp.int32)[:, None] + dx[None, :] * sc)  # (N, P)
    y0 = (vi.astype(jnp.int32)[:, None] + dy[None, :] * sc)
    tl = _gather(img, x0, y0)
    tr = _gather(img, x0 + sc, y0)
    bl = _gather(img, x0, y0 + sc)
    br = _gather(img, x0 + sc, y0 + sc)
    return (
        w_tl[:, None] * tl + w_tr[:, None] * tr + w_bl[:, None] * bl + w_br[:, None] * br
    )


def sample_patches_with_grad(img: jnp.ndarray, px: jnp.ndarray, scale: jnp.ndarray,
                             patch_size: int):
    """Patch values + strided central-difference gradients (du, dv), the
    hot sampling of updateState (vio.cpp:1595-1620). Returns three
    (N, patch²) arrays; gradients are in *scaled* pixel units (the 1/scale
    factor of :1613 is applied by the caller's Jacobian chain)."""
    dx, dy = patch_offsets(patch_size)
    u, v = px[:, 0], px[:, 1]
    s = scale.astype(jnp.float32)
    ui = jnp.floor(u / s) * s
    vi = jnp.floor(v / s) * s
    su = (u - ui) / s
    sv = (v - vi) / s
    w_tl = ((1 - su) * (1 - sv))[:, None]
    w_tr = (su * (1 - sv))[:, None]
    w_bl = ((1 - su) * sv)[:, None]
    w_br = (su * sv)[:, None]

    sc = scale[:, None]
    x0 = ui.astype(jnp.int32)[:, None] + dx[None, :] * sc
    y0 = vi.astype(jnp.int32)[:, None] + dy[None, :] * sc

    def bil(xo, yo):
        tl = _gather(img, x0 + xo, y0 + yo)
        tr = _gather(img, x0 + xo + sc, y0 + yo)
        bl = _gather(img, x0 + xo, y0 + yo + sc)
        br = _gather(img, x0 + xo + sc, y0 + yo + sc)
        return w_tl * tl + w_tr * tr + w_bl * bl + w_br * br

    val = bil(0, 0)
    du = 0.5 * (bil(sc, 0) - bil(-sc, 0))
    dv = 0.5 * (bil(0, sc) - bil(0, -sc))
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


def shi_tomasi(img: jnp.ndarray, px: jnp.ndarray, halfbox: int = 4) -> jnp.ndarray:
    """Shi-Tomasi corner score at (N, 2) integer-ish pixel locations
    (vk::shiTomasiScore as used at vio.cpp:822): min eigenvalue of the
    averaged gradient structure tensor over an 8x8 box."""
    box = 2 * halfbox
    dxs, dys = patch_offsets(box)
    xi = px[:, 0].astype(jnp.int32)[:, None] + dxs[None, :]
    yi = px[:, 1].astype(jnp.int32)[:, None] + dys[None, :]
    dx = 0.5 * (_gather(img, xi + 1, yi) - _gather(img, xi - 1, yi))
    dy = 0.5 * (_gather(img, xi, yi + 1) - _gather(img, xi, yi - 1))
    npix = box * box
    dxx = jnp.sum(dx * dx, axis=1) / npix
    dyy = jnp.sum(dy * dy, axis=1) / npix
    dxy = jnp.sum(dx * dy, axis=1) / npix
    tr = dxx + dyy
    det = dxx * dyy - dxy * dxy
    return 0.5 * (tr - jnp.sqrt(jnp.clip(tr * tr - 4 * det, 0.0, None)))
