"""Fused Pallas kernel for one photometric ESIKF iteration
(VERDICT r4 next-round item 5 / SURVEY §7 Stage 3).

The XLA photometric update (core/vio.photometric_update) runs 3 pyramid
levels x <=5 lax.while_loop iterations, each iteration a chain of ~40
small ops: project -> strided superpatch gather -> bilinear + gradients
-> Jacobian chain -> masked 7x7 H^T H / H^T z reduction. Chained-slope
measurement puts the whole stage at 2.3-2.8 ms/frame — dominated by
serial small-op launches, not bandwidth (docs/ROOFLINE.md).

This kernel fuses EVERYTHING between the state update and the 7x7
normal equations into ONE pallas_call per iteration, with the math
reformulated for Mosaic's vector layouts:

  - grid = (M,), one program per tracked point; the image (H, W) f32
    lives whole in VMEM (~1.3 MB), so the 12x12 strided superpatch is
    12 row loads instead of an HBM gather. The per-point stride
    s = 2^(pyramid+search level) is a lax.switch over static strides,
    each branch loading contiguous (12*s,) rows and decimating via
    reshape(12, s)[:, 0].
  - the Jacobian chain is algebraically collapsed: every H column is a
    SCALAR combination of the du/dv/val patch planes,
        H_c = a_c * du + b_c * dv   (c = 0..5),   H_6 = expo * val,
    because Jdpi/p_hat/Rci-derived matrices are per-point 3x3 scalars.
    The masked 7x7 H^T H + H^T z therefore reduces to TEN patch
    reductions (S_uu, S_uv, S_vv, S_uval, S_vval, S_valval, S_ures,
    S_vres, S_valres, S_resres) plus closed-form scalar assembly —
    no (64, 7) matrices, no reshapes, no dots (all three are
    unsupported or slow under Mosaic's tiled layouts).
  - the kernel emits one 64-float row [HTH(49) | HTz(7) | err | cnt]
    and XLA reduces over points.

Camera model: pinhole (+ radtan distortion for the projection; the
projection Jacobian ignores distortion exactly like the reference's
computeProjectionJacobian, vio.cpp:189-201). The fisheye and
true-pyramid paths fall back to the XLA implementation.

Border semantics deviate from the XLA path in one corner: the XLA
sampler clips every tap to the image rect independently, while the
kernel clips the 12-row window base (rows individually, columns as a
block) — identical away from the border, and border patches are
outlier-gated anyway. Parity is tested in tests/test_pallas_photo.py.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# pts_meta layout (per point): pos(0:3) | scale_log2(3) | ok(4); pad 8.
META_W = 8
# params layout: Rcw(0:9) | Pcw(9:12) | tau(12) | Jdphi_dR(13:22) |
# Jdp_dR(22:31) | fx fy cx cy (31:35) | k1 k2 p1 p2 (35:39) |
# expo_flag(39) | has_dist(40); padded to 64.
PAR_W = 64
OUT_W = 64  # HTH(49) | HTz(7) | err(56) | cnt(57) | pad

_WIN = 12  # superpatch rows/cols (ps + 4 at ps = 8)


def _kernel(meta_ref, ref_ref, par_ref, img_ref, out_ref, *, ps: int,
            max_scale_log2: int):
    i = pl.program_id(0)
    H, W = img_ref.shape

    def P(j):
        return par_ref[0, j]

    # list-of-scalars 3x3s; the matrix products below are unrolled
    # scalar algebra — Mosaic cannot reshape/dot small vectors
    Rcw = [[P(3 * r + c) for c in range(3)] for r in range(3)]
    Pcw = [P(9), P(10), P(11)]
    tau = P(12)
    JdphiR = [[P(13 + 3 * r + c) for c in range(3)] for r in range(3)]
    JdpR = [[P(22 + 3 * r + c) for c in range(3)] for r in range(3)]
    fx, fy, cx, cy = P(31), P(32), P(33), P(34)
    k1, k2, p1, p2 = P(35), P(36), P(37), P(38)
    expo_flag = P(39)
    has_dist = P(40)

    pos = [meta_ref[i, 0], meta_ref[i, 1], meta_ref[i, 2]]
    slog = meta_ref[i, 3].astype(jnp.int32)
    ok0 = meta_ref[i, 4] > 0.5
    ref_patch = ref_ref[i, :, :]  # (ps, ps)

    pfx = Rcw[0][0] * pos[0] + Rcw[0][1] * pos[1] + Rcw[0][2] * pos[2] + Pcw[0]
    pfy = Rcw[1][0] * pos[0] + Rcw[1][1] * pos[1] + Rcw[1][2] * pos[2] + Pcw[1]
    pfz = Rcw[2][0] * pos[0] + Rcw[2][1] * pos[1] + Rcw[2][2] * pos[2] + Pcw[2]
    z_ok = pfz > 1e-6
    z = jnp.where(jnp.abs(pfz) < 1e-9, 1e-9, pfz)
    un = pfx / z
    vn = pfy / z
    r2 = un * un + vn * vn
    radial = 1.0 + k1 * r2 + k2 * r2 * r2
    ud = un * radial + 2 * p1 * un * vn + p2 * (r2 + 2 * un * un)
    vd = vn * radial + p1 * (r2 + 2 * vn * vn) + 2 * p2 * un * vn
    uu = jnp.where(has_dist > 0.5, ud, un)
    vv = jnp.where(has_dist > 0.5, vd, vn)
    u = fx * uu + cx
    v = fy * vv + cy

    half = ps // 2
    lo = -half - 1  # superpatch base offset (sample_patches_with_grad)

    # Strided 12x12 superpatch via one small MXU contraction: load the
    # 12 FULL image rows (static, lane-aligned), then select the 12
    # strided taps per row with a dynamically-built one-hot matrix —
    # window = rows(12, W) @ onehot(W, 12). No dynamic-start vector
    # loads, no reshapes, no rotates (all unsupported or misaligned
    # under Mosaic for arbitrary strides); the stride itself stays a
    # traced scalar, so no branch switch either.
    sd = jnp.int32(1) << jnp.clip(slog, 0, max_scale_log2)
    sf = sd.astype(jnp.float32)
    ui = jnp.floor(u / sf) * sf
    vi = jnp.floor(v / sf) * sf
    x0 = ui.astype(jnp.int32) + lo * sd
    y0 = vi.astype(jnp.int32) + lo * sd
    x0 = jnp.clip(x0, 0, W - _WIN * sd)
    rows = [
        img_ref[pl.ds(jnp.clip(y0 + l * sd, 0, H - 1), 1), :]
        for l in range(_WIN)
    ]
    Wfull = jnp.concatenate(rows, axis=0)  # (12, W)
    lane = jax.lax.broadcasted_iota(jnp.int32, (W, _WIN), 0)
    tapc = x0 + jax.lax.broadcasted_iota(jnp.int32, (W, _WIN), 1) * sd
    sel = (lane == tapc).astype(jnp.float32)  # (W, 12) one-hot columns
    sp = jnp.dot(Wfull, sel, preferred_element_type=jnp.float32)  # (12,12)

    su = (u - jnp.floor(u / sf) * sf) / sf
    sv = (v - jnp.floor(v / sf) * sf) / sf

    w_tl = (1 - su) * (1 - sv)
    w_tr = su * (1 - sv)
    w_bl = (1 - su) * sv
    w_br = su * sv

    def bil(r0, c0):
        blk = sp[r0:r0 + ps + 1, c0:c0 + ps + 1]
        return (w_tl * blk[:ps, :ps] + w_tr * blk[:ps, 1:]
                + w_bl * blk[1:, :ps] + w_br * blk[1:, 1:])  # (ps, ps)

    val = bil(1, 1)
    du = 0.5 * (bil(1, 2) - bil(1, 0))
    dv = 0.5 * (bil(2, 1) - bil(0, 1))
    res = tau * val - ref_patch

    # ---- scalar Jacobian-chain coefficients --------------------------
    # H_c = a[c] * du + b[c] * dv for c in 0..5; H_6 = expo * val.
    zi = 1.0 / z
    zi2 = zi * zi
    g = tau / sf
    A = [fx * zi, zi * 0.0, -fx * pfx * zi2]   # Jdpi row 0
    B = [zi * 0.0, fy * zi, -fy * pfy * zi2]   # Jdpi row 1
    ph = [[zi * 0.0, -pfz, pfy],
          [pfz, zi * 0.0, -pfx],
          [-pfy, pfx, zi * 0.0]]               # skew(pf)
    # Jca_k = g * (A_k du + B_k dv);  Jdphi_c = sum_k Jca_k ph[k][c]
    PA = [sum(A[k] * ph[k][c] for k in range(3)) for c in range(3)]
    PB = [sum(B[k] * ph[k][c] for k in range(3)) for c in range(3)]
    a = [g * (sum(PA[k] * JdphiR[k][c] for k in range(3))
              - sum(A[k] * JdpR[k][c] for k in range(3)))
         for c in range(3)]
    b = [g * (sum(PB[k] * JdphiR[k][c] for k in range(3))
              - sum(B[k] * JdpR[k][c] for k in range(3)))
         for c in range(3)]
    a += [-g * sum(A[k] * Rcw[k][c] for k in range(3)) for c in range(3)]
    b += [-g * sum(B[k] * Rcw[k][c] for k in range(3)) for c in range(3)]

    okf = jnp.where(ok0 & z_ok, 1.0, 0.0)
    S_uu = okf * jnp.sum(du * du)
    S_uv = okf * jnp.sum(du * dv)
    S_vv = okf * jnp.sum(dv * dv)
    S_uval = okf * jnp.sum(du * val)
    S_vval = okf * jnp.sum(dv * val)
    S_valval = okf * jnp.sum(val * val)
    S_ures = okf * jnp.sum(du * res)
    S_vres = okf * jnp.sum(dv * res)
    S_valres = okf * jnp.sum(val * res)
    S_resres = okf * jnp.sum(res * res)

    hth = []
    for c in range(7):
        for d in range(7):
            if c < 6 and d < 6:
                e = (a[c] * a[d] * S_uu + (a[c] * b[d] + b[c] * a[d]) * S_uv
                     + b[c] * b[d] * S_vv)
            elif c < 6:
                e = expo_flag * (a[c] * S_uval + b[c] * S_vval)
            elif d < 6:
                e = expo_flag * (a[d] * S_uval + b[d] * S_vval)
            else:
                e = expo_flag * expo_flag * S_valval
            hth.append(e)
    htz = [a[c] * S_ures + b[c] * S_vres for c in range(6)]
    htz.append(expo_flag * S_valres)
    out = jnp.stack(
        hth + htz + [S_resres, okf * ps * ps]
        + [S_resres * 0.0] * (OUT_W - 58))
    out_ref[i, :] = out


def photo_iteration(img, pts_meta, ref_patch, params, ps: int = 8,
                    max_scale_log2: int = 4, interpret: bool = False):
    """One fused photometric iteration.

    img: (H, W) f32; pts_meta: (M, META_W); ref_patch: (M, ps, ps);
    params: (1, PAR_W).
    Returns (HTH7 (7, 7), HTz7 (7,), err_sum (), cnt ())."""
    M = pts_meta.shape[0]
    if jax.default_backend() != "tpu":
        interpret = True  # CPU tests / virtual meshes run interpreted
    # branches with 12*s wider than the image cannot slice; cap the
    # stride set by width (points are clipped to the max branch)
    W = img.shape[-1]
    while (1 << max_scale_log2) * _WIN > W and max_scale_log2 > 0:
        max_scale_log2 -= 1
    out = pl.pallas_call(
        functools.partial(_kernel, ps=ps, max_scale_log2=max_scale_log2),
        grid=(M,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # pts meta
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ref patches
            pl.BlockSpec(memory_space=pltpu.VMEM),  # params row
            pl.BlockSpec(memory_space=pltpu.VMEM),  # whole image
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, OUT_W), jnp.float32),
        interpret=interpret,
    )(pts_meta, ref_patch, params, img)
    tot = jnp.sum(out, axis=0)
    return (tot[0:49].reshape(7, 7), tot[49:56], tot[56], tot[57])


def pack_points(pos, ref_patch, scale_log2, ok, ps: int = 8):
    """((M, META_W), (M, ps, ps)) inputs for photo_iteration."""
    M = pos.shape[0]
    meta = jnp.zeros((M, META_W), jnp.float32)
    meta = meta.at[:, 0:3].set(pos)
    meta = meta.at[:, 3].set(scale_log2.astype(jnp.float32))
    meta = meta.at[:, 4].set(ok.astype(jnp.float32))
    return meta, ref_patch.reshape(M, ps, ps).astype(jnp.float32)


def pack_params(Rcw, Pcw, tau, Jdphi_dR, Jdp_dR, fx, fy, cx, cy, dist,
                expo_flag: float, has_dist: float):
    """(1, PAR_W) parameter row for photo_iteration."""
    par = jnp.zeros((PAR_W,), jnp.float32)
    par = par.at[0:9].set(Rcw.reshape(-1))
    par = par.at[9:12].set(Pcw)
    par = par.at[12].set(tau)
    par = par.at[13:22].set(Jdphi_dR.reshape(-1))
    par = par.at[22:31].set(Jdp_dR.reshape(-1))
    par = par.at[31].set(fx)
    par = par.at[32].set(fy)
    par = par.at[33].set(cx)
    par = par.at[34].set(cy)
    par = par.at[35:39].set(jnp.asarray(dist, jnp.float32)[:4])
    par = par.at[39].set(expo_flag)
    par = par.at[40].set(has_dist)
    return par[None, :]
