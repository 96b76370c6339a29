"""
Differentiable (softmax-blend) rasterization as a Pallas kernel pair with a
custom VJP: the TPU fast path for training through rendering.

Semantics match :func:`torchdrivesim_tpu.ops.rasterize.rasterize_softmax`
(the decoupled coverage / z-arbitration blend documented there and in
docs/design.md, our replacement for pytorch3d's soft blending,
`torchdrivesim/rendering/pytorch3d.py:27-44`): per pixel, each face
contributes soft coverage ``alpha = prod_e sigmoid(d_e/sigma) * ramp`` and
faces resolve by softmax over ``alpha * exp(-z/gamma)`` against the sampled
background.

Why a kernel: XLA's autodiff of the chunked-accumulator formulation
materializes (B, F, 3, H, W) residuals through HBM, making the backward
~6x the forward (measured 2.5 ms vs 0.4 ms per IL step at B=16, F=24,
res=64). Here the backward RECOMPUTES everything in VMEM from the per-face
edge coefficients (3 FMAs + 3 sigmoids per face per pixel tile) and reduces
per-face gradients to (1, res) rows in-kernel; one cheap XLA sum finishes
the contraction. No pixel-space residual ever touches HBM.

Layout: 4 cameras per program (fixed per-program costs amortize; same
reasoning as the fused hard kernel), flat full-lane (res*res/128, 128)
pixel tiles (a (res, res) tile at res < 128 would idle half the vreg
lanes), per-face scalar coefficients read from SMEM. The logistic is
computed manually as 1/(1+exp(-t)): jax.nn.sigmoid lowers ~6x slower
through Mosaic (measured 4.3 ms vs 0.7 ms for the forward at B=16, F=24).

The custom_vjp boundary sits at (edge coefficients, z-weights, colors,
background): everything upstream (vertex gather, camera transform, the
sign/length normalization, degenerate-face masking) is plain differentiable
XLA, so `jax.grad` flows end-to-end to vertices and camera pose.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from torchdrivesim_tpu.ops.rasterize import DEGENERATE_AREA_EPS, _face_arrays

#: faces per kernel call (SMEM coefficient table size per camera); larger
#: face sets split into groups of this size whose partial accumulators
#: combine in XLA (see rasterize_softmax_pallas)
MAX_FACES = 128

#: pixel budget per band tile of the grouped-accumulator kernels (rows of
#: 128 lanes); matches pallas_rasterize.PIXELS_PER_TILE
_MAX_BAND_ROWS = 32


def _band_rows_flat(res: int) -> int:
    """Rows (of 128 lanes) per pixel band in the grouped kernels: the
    largest divisor of the flat row count that fits the band budget."""
    rows = (res * res) // 128
    best = 1
    for d in range(1, min(rows, _MAX_BAND_ROWS) + 1):
        if rows % d == 0:
            best = d
    return best


def _band_plan(res: int):
    """(padded flat rows, band rows) for the grouped kernels' pixel grid.

    Mosaic requires each block's second-minor dim to be divisible by 8 or
    equal to the full array dim. A flat row count like 50 (res 80) has no
    such divisor under the band budget (measured reject on hardware --
    tools/certify_compile_matrix.py), so the pixel space is padded to a
    multiple of 8 rows: padded pixels compute garbage that is sliced off
    (forward) or driven by zero cotangents (backward)."""
    rows = (res * res) // 128
    band = _band_rows_flat(res)
    if band == rows or band % 8 == 0:
        return rows, band
    rows_pad = -(-rows // 8) * 8
    band = 8
    for d in range(8, min(rows_pad, _MAX_BAND_ROWS) + 1, 8):
        if rows_pad % d == 0:
            band = d
    return rows_pad, band


def supports_soft(n_faces: int, res: int) -> bool:
    """Whether the Pallas soft-raster fast path serves this shape: any face
    count (grouped into MAX_FACES-face kernel calls) at any resolution whose
    pixel count tiles into whole 128-lane vector registers."""
    del n_faces
    return res >= 8 and (res * res) % 128 == 0


def _soft_coefficients(verts, faces, attrs, sigma, gamma):
    """Per-face normalized edge coefficients t_e(p) = A*px + B*py + C (the
    sigmoid argument, i.e. signed pixel distance / sigma), z weights, and
    colors -- differentiable XLA math shared by forward and backward.

    Matches `ops/rasterize.py:_edge_functions` + the normalization in
    `rasterize_softmax`: d_e = cross(b-a, p-a) * sign(area) / (|b-a|+1e-8).
    Degenerate faces get C = -1e9 so their coverage (and gradients) vanish
    inside the kernel without a separate mask operand.
    """
    corners, z, color = _face_arrays(verts, faces, attrs)
    nxt = [1, 2, 0]
    a = corners
    b = corners[..., nxt, :]
    ex = b[..., 0] - a[..., 0]
    ey = b[..., 1] - a[..., 1]
    area = (ex[..., 0] * (a[..., 2, 1] - a[..., 0, 1])
            - ey[..., 0] * (a[..., 2, 0] - a[..., 0, 0]))
    sign = jnp.sign(area)[..., None]
    # max() keeps sqrt'(0) finite: degenerate (masked) faces would otherwise
    # poison the upstream vertex gradient with 0 * inf = NaN
    elen = jnp.sqrt(jnp.maximum(ex * ex + ey * ey, 1e-12))
    norm = sign / ((elen + 1e-8) * sigma)
    ok = (jnp.abs(area) > DEGENERATE_AREA_EPS)[..., None]
    ca = jnp.where(ok, (-ey) * norm, 0.0)  # coefficient of px (row)
    cb = jnp.where(ok, ex * norm, 0.0)     # coefficient of py (col)
    cc = jnp.where(ok, (ey * a[..., 0] - ex * a[..., 1]) * norm, -1e9)
    coef = jnp.stack([ca, cb, cc], axis=-1)           # (B, F, 3, 3)
    z_bg = 20.0
    zw = jnp.exp((z_bg - z) / gamma)
    return coef, zw, color


def _smem_row_spec(cams: int, n: int, grid_dims: int = 1):
    """(cams, 1, n) SMEM block (same block at every grid step): flattened
    lane-aligned rows dodge Mosaic's trailing-dim tile padding, which
    inflates small trailing dims to whole tiles and blows the 1 MB SMEM
    budget (docs/design.md 3d)."""
    idx = (lambda i: (i, 0, 0)) if grid_dims == 1 \
        else (lambda i, j: (i, 0, 0))
    return pl.BlockSpec((cams, 1, n), idx, memory_space=pltpu.SMEM)


def _pixel_grids(res):
    """Pixel-center coordinates on the flat (res*res/128, 128) tile.

    Full-lane tiles: a (res, res) tile at res < 128 would waste
    128 - res vreg lanes; the row-major flat view keeps all 128 busy and
    reshapes back for free in XLA (row-major contiguity)."""
    rows = (res * res) // 128
    idx = (jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 0) * 128
           + jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1))
    px = (idx // res).astype(jnp.float32) + 0.5
    py = (idx % res).astype(jnp.float32) + 0.5
    return rows, px, py


def _accumulate_face(coef_ref, zw_ref, c, f, px, py):
    """Per-face forward quantities on the pixel tile.

    ``coef_ref`` is the FLATTENED (cams, 1, n_faces * 9) SMEM view: Mosaic
    pads each trailing SMEM window dim to a full tile, so the natural
    (cams, F, 3, 3) layout inflates to ~1 MB per buffer at F = 128 and
    overflows the 1 MB SMEM budget (caught on real hardware by
    tools/certify_soft_grouped.py; interpret mode accepted it silently).
    """
    t = [coef_ref[c, 0, f * 9 + e * 3 + 0] * px
         + coef_ref[c, 0, f * 9 + e * 3 + 1] * py
         + coef_ref[c, 0, f * 9 + e * 3 + 2] for e in range(3)]
    # manual logistic: jax.nn.sigmoid lowers ~6x slower through Mosaic.
    # The argument is CLAMPED to +-30 (where f32 sigmoid saturates exactly)
    # because XLA may rewrite 1/(1+exp(-t)) as exp(t)/(1+exp(t)), which is
    # inf/inf = NaN once exp(t) overflows -- observed polluting whole pixel
    # bands when padded far-out pixels push |t| past ~88 (the rewrite
    # applies per fused tile, so the NaN surfaced only for some band
    # shapes; tools/certify_compile_matrix.py / res 80 grouped)
    s = [1.0 / (1.0 + jnp.exp(-jnp.clip(te, -30.0, 30.0))) for te in t]
    big_s = s[0] * s[1] * s[2]
    tmin = jnp.minimum(jnp.minimum(t[0], t[1]), t[2])
    window = jnp.clip(tmin + 4.0, 0.0, 1.0)
    alpha = big_s * window
    return t, s, big_s, tmin, window, alpha


def _soft_fwd_kernel(coef_ref, zw_ref, col_ref, bg_ref, out_ref,
                     *, n_faces, res, cams):
    rows, px, py = _pixel_grids(res)
    for c in range(cams):
        num = [jnp.zeros((rows, 128), jnp.float32) for _ in range(3)]
        den = jnp.zeros((rows, 128), jnp.float32)
        transp = jnp.ones((rows, 128), jnp.float32)
        for f in range(n_faces):
            _, _, _, _, _, alpha = _accumulate_face(
                coef_ref, zw_ref, c, f, px, py)
            w = alpha * zw_ref[c, 0, f]
            for ch in range(3):
                num[ch] = num[ch] + w * col_ref[c, 0, f * 3 + ch]
            den = den + w
            transp = transp * (1.0 - alpha)
        inv_den = 1.0 / jnp.maximum(den, 1e-8)
        cover = 1.0 - transp
        for ch in range(3):
            cface = num[ch] * inv_den
            out_ref[c, ch] = cover * cface + transp * bg_ref[c, ch]


def _soft_bwd_kernel(coef_ref, zw_ref, col_ref, bg_ref, g_ref,
                     grow_ref, gbg_ref, alpha_ref, prefix_ref,
                     *, n_faces, res, cams):
    """Full in-VMEM recompute + per-face gradient row reduction.

    grow_ref: (cams, n_faces, 13, res) partial sums over image rows --
    [gA0 gB0 gC0 gA1 gB1 gC1 gA2 gB2 gC2 gzw gcolR gcolG gcolB]; the
    caller sums over the last axis.
    """
    rows, px, py = _pixel_grids(res)
    for c in range(cams):
        # pass 1: alphas, coverage prefix products, den/num accumulators
        num = [jnp.zeros((rows, 128), jnp.float32) for _ in range(3)]
        den = jnp.zeros((rows, 128), jnp.float32)
        transp = jnp.ones((rows, 128), jnp.float32)
        for f in range(n_faces):
            _, _, _, _, _, alpha = _accumulate_face(
                coef_ref, zw_ref, c, f, px, py)
            alpha_ref[f] = alpha
            prefix_ref[f] = transp
            w = alpha * zw_ref[c, 0, f]
            for ch in range(3):
                num[ch] = num[ch] + w * col_ref[c, 0, f * 3 + ch]
            den = den + w
            transp = transp * (1.0 - alpha)

        # max(den, eps): the num-gradient always flows through 1/D, the
        # den-gradient only where den > eps (matching jnp.maximum autodiff)
        dmask = (den > 1e-8).astype(jnp.float32)
        inv_den = 1.0 / jnp.maximum(den, 1e-8)
        cover = 1.0 - transp
        cface = [num[ch] * inv_den for ch in range(3)]
        g = [g_ref[c, ch] for ch in range(3)]
        # dL/dA and the per-channel numerator factors P_c = g_c * A / D
        dl_da = jnp.zeros((rows, 128), jnp.float32)
        p_ch = []
        q = jnp.zeros((rows, 128), jnp.float32)
        for ch in range(3):
            dl_da = dl_da + g[ch] * (cface[ch] - bg_ref[c, ch])
            p = g[ch] * cover * inv_den
            p_ch.append(p)
            q = q - p * cface[ch] * dmask
            gbg_ref[c, ch] = g[ch] * transp

        # pass 2: descending-face suffix products; per-face grad rows
        suffix = jnp.ones((rows, 128), jnp.float32)
        for f in range(n_faces - 1, -1, -1):
            alpha = alpha_ref[f]
            except_f = prefix_ref[f] * suffix
            suffix = suffix * (1.0 - alpha)
            dl_dw = (p_ch[0] * col_ref[c, 0, f * 3 + 0]
                     + p_ch[1] * col_ref[c, 0, f * 3 + 1]
                     + p_ch[2] * col_ref[c, 0, f * 3 + 2] + q)
            dl_dalpha = zw_ref[c, 0, f] * dl_dw + dl_da * except_f
            t, s, big_s, tmin, window, _ = _accumulate_face(
                coef_ref, zw_ref, c, f, px, py)
            wmask = ((tmin > -4.0) & (tmin < -3.0)).astype(jnp.float32)
            sw = dl_dalpha * big_s * wmask

            def put(k, val, c=c, f=f):
                grow_ref[c, f, k:k + 1, :] = jnp.sum(val, axis=0,
                                                     keepdims=True)

            for e in range(3):
                gt = dl_dalpha * (alpha * (1.0 - s[e])) \
                    + sw * (t[e] == tmin).astype(jnp.float32)
                put(3 * e + 0, gt * px)
                put(3 * e + 1, gt * py)
                put(3 * e + 2, gt)
            put(9, dl_dw * alpha)
            w = alpha * zw_ref[c, 0, f]
            for ch in range(3):
                put(10 + ch, p_ch[ch] * w)


def _pallas_soft_fwd(coef, zw, color, background, *, res, cams, interpret):
    b, _, n_faces = zw.shape
    rows = (res * res) // 128
    cam_idx4 = lambda i: (i, 0, 0, 0)
    smem2 = lambda n: _smem_row_spec(cams, n)
    out = pl.pallas_call(
        functools.partial(_soft_fwd_kernel, n_faces=n_faces, res=res,
                          cams=cams),
        grid=(b // cams,),
        in_specs=[
            smem2(n_faces * 9),
            smem2(n_faces),
            smem2(n_faces * 3),
            pl.BlockSpec((cams, 3, rows, 128), cam_idx4,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cams, 3, rows, 128), cam_idx4,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 3, rows, 128), jnp.float32),
        # interpret=False is omitted (not passed) so tests that monkeypatch
        # pl.pallas_call with functools.partial(..., interpret=True) work
        **({'interpret': True} if interpret else {}),
    )(coef.reshape(b, 1, n_faces * 9), zw.reshape(b, 1, n_faces),
      color.reshape(b, 1, n_faces * 3),
      background.reshape(b, 3, rows, 128))
    return out.reshape(b, 3, res, res)


def _pallas_soft_bwd(coef, zw, color, background, g, *, res, cams,
                     interpret):
    b, _, n_faces = zw.shape
    rows = (res * res) // 128
    cam_idx4 = lambda i: (i, 0, 0, 0)
    smem2 = lambda n: _smem_row_spec(cams, n)
    grow, gbg = pl.pallas_call(
        functools.partial(_soft_bwd_kernel, n_faces=n_faces, res=res,
                          cams=cams),
        grid=(b // cams,),
        in_specs=[
            smem2(n_faces * 9),
            smem2(n_faces),
            smem2(n_faces * 3),
            pl.BlockSpec((cams, 3, rows, 128), cam_idx4,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cams, 3, rows, 128), cam_idx4,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((cams, n_faces, 13, 128), cam_idx4,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cams, 3, rows, 128), cam_idx4,
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_faces, 13, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, 3, rows, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_faces, rows, 128), jnp.float32),
            pltpu.VMEM((n_faces, rows, 128), jnp.float32),
        ],
        **({'interpret': True} if interpret else {}),
    )(coef.reshape(b, 1, n_faces * 9), zw.reshape(b, 1, n_faces),
      color.reshape(b, 1, n_faces * 3),
      background.reshape(b, 3, rows, 128), g.reshape(b, 3, rows, 128))
    sums = jnp.sum(grow, axis=-1)                     # (B, F, 13)
    gcoef = sums[..., :9].reshape(b, n_faces, 3, 3)
    gzw = sums[..., 9][:, None, :]                    # matches zw (B, 1, F)
    gcolor = sums[..., 10:13]
    return gcoef, gzw, gcolor, gbg.reshape(b, 3, res, res)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _soft_raster_core(coef, zw, color, background, res, cams, interpret):
    return _pallas_soft_fwd(coef, zw, color, background, res=res,
                            cams=cams, interpret=interpret)


def _core_fwd(coef, zw, color, background, res, cams, interpret):
    out = _pallas_soft_fwd(coef, zw, color, background, res=res, cams=cams,
                           interpret=interpret)
    return out, (coef, zw, color, background)


def _core_bwd(res, cams, interpret, residuals, g):
    coef, zw, color, background = residuals
    gcoef, gzw, gcolor, gbg = _pallas_soft_bwd(
        coef, zw, color, background, g, res=res, cams=cams,
        interpret=interpret)
    return gcoef, gzw, gcolor, gbg


_soft_raster_core.defvjp(_core_fwd, _core_bwd)


# ----------------------------------------------------------------------------
# Grouped-accumulator kernels: arbitrary face counts and resolutions
# ----------------------------------------------------------------------------
# The softmax blend decomposes over face GROUPS: ``num``/``den`` accumulate
# additively and transparency multiplicatively, so each MAX_FACES-face group
# runs as an independent kernel call emitting partial (num, den, transp)
# images, combined by cheap elementwise XLA whose autodiff routes the right
# cotangents back into each group's custom VJP. Pixel BANDS (a second grid
# dimension over flat 128-lane rows) bound VMEM at any resolution; the
# backward's per-face gradient rows accumulate across bands in the revisited
# output block (the TPU grid is sequential).


def _band_pixel_grids(res, band):
    """Pixel-center coordinates on the flat (band, 128) tile of pixel band
    ``pl.program_id(1)``."""
    base = pl.program_id(1) * band * 128
    idx = (jax.lax.broadcasted_iota(jnp.int32, (band, 128), 0) * 128
           + jax.lax.broadcasted_iota(jnp.int32, (band, 128), 1) + base)
    px = (idx // res).astype(jnp.float32) + 0.5
    py = (idx % res).astype(jnp.float32) + 0.5
    return px, py


def _accum_fwd_kernel(coef_ref, zw_ref, col_ref, num_ref, den_ref,
                      transp_ref, *, n_faces, res, band, cams):
    px, py = _band_pixel_grids(res, band)
    for c in range(cams):
        num = [jnp.zeros((band, 128), jnp.float32) for _ in range(3)]
        den = jnp.zeros((band, 128), jnp.float32)
        transp = jnp.ones((band, 128), jnp.float32)
        for f in range(n_faces):
            _, _, _, _, _, alpha = _accumulate_face(
                coef_ref, zw_ref, c, f, px, py)
            w = alpha * zw_ref[c, 0, f]
            for ch in range(3):
                num[ch] = num[ch] + w * col_ref[c, 0, f * 3 + ch]
            den = den + w
            transp = transp * (1.0 - alpha)
        for ch in range(3):
            num_ref[c, ch] = num[ch]
        den_ref[c] = den
        transp_ref[c] = transp


def _accum_bwd_kernel(coef_ref, zw_ref, col_ref, gnum_ref, gden_ref,
                      gtransp_ref, grow_ref, alpha_ref, prefix_ref,
                      *, n_faces, res, band, cams):
    """Recompute-in-VMEM backward of one face group's accumulators.

    grow_ref: (cams, n_faces, 13, 128) per-face gradient rows
    [gA0 gB0 gC0 ... gA2 gB2 gC2 gzw gcolR gcolG gcolB], ACCUMULATED over
    pixel bands (the block index ignores the band grid dim); the caller
    sums over the last axis.
    """
    px, py = _band_pixel_grids(res, band)

    @pl.when(pl.program_id(1) == 0)
    def _():
        grow_ref[...] = jnp.zeros_like(grow_ref)

    for c in range(cams):
        # pass 1: alphas and coverage prefix products
        transp = jnp.ones((band, 128), jnp.float32)
        for f in range(n_faces):
            _, _, _, _, _, alpha = _accumulate_face(
                coef_ref, zw_ref, c, f, px, py)
            alpha_ref[f] = alpha
            prefix_ref[f] = transp
            transp = transp * (1.0 - alpha)

        g = [gnum_ref[c, ch] for ch in range(3)]
        gden = gden_ref[c]
        gtr = gtransp_ref[c]

        # pass 2: descending-face suffix products; per-face grad rows
        suffix = jnp.ones((band, 128), jnp.float32)
        for f in range(n_faces - 1, -1, -1):
            alpha = alpha_ref[f]
            except_f = prefix_ref[f] * suffix
            suffix = suffix * (1.0 - alpha)
            dl_dw = (g[0] * col_ref[c, 0, f * 3 + 0]
                     + g[1] * col_ref[c, 0, f * 3 + 1]
                     + g[2] * col_ref[c, 0, f * 3 + 2] + gden)
            # d transp / d alpha_f = -prod_{f' != f} (1 - alpha_f')
            dl_dalpha = zw_ref[c, 0, f] * dl_dw - gtr * except_f
            t, s, big_s, tmin, window, _ = _accumulate_face(
                coef_ref, zw_ref, c, f, px, py)
            wmask = ((tmin > -4.0) & (tmin < -3.0)).astype(jnp.float32)
            sw = dl_dalpha * big_s * wmask

            def put(k, val, c=c, f=f):
                grow_ref[c, f, k:k + 1, :] = (
                    grow_ref[c, f, k:k + 1, :]
                    + jnp.sum(val, axis=0, keepdims=True))

            for e in range(3):
                gt = dl_dalpha * (alpha * (1.0 - s[e])) \
                    + sw * (t[e] == tmin).astype(jnp.float32)
                put(3 * e + 0, gt * px)
                put(3 * e + 1, gt * py)
                put(3 * e + 2, gt)
            put(9, dl_dw * alpha)
            w = alpha * zw_ref[c, 0, f]
            for ch in range(3):
                put(10 + ch, g[ch] * w)


def _pallas_accum_fwd(coef, zw, color, *, res, cams, interpret):
    b, _, n_faces = zw.shape
    rows = (res * res) // 128
    rows_pad, band = _band_plan(res)
    smem2 = lambda n: _smem_row_spec(cams, n, grid_dims=2)
    num, den, transp = pl.pallas_call(
        functools.partial(_accum_fwd_kernel, n_faces=n_faces, res=res,
                          band=band, cams=cams),
        grid=(b // cams, rows_pad // band),
        # the unrolled 128-face group keeps enough temporaries live that
        # the compiler's scoped-vmem STACK wants ~16.3 MB when this kernel
        # sits inside a larger jit (default limit 16 MB; measured overflow
        # 296 KB at res 64, B=4 -- tools/certify_compile_matrix.py); v5e
        # has far more physical VMEM, so raise the cap rather than split
        # the face loop
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        in_specs=[
            smem2(n_faces * 9),
            smem2(n_faces),
            smem2(n_faces * 3),
        ],
        out_specs=[
            pl.BlockSpec((cams, 3, band, 128), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cams, band, 128), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cams, band, 128), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 3, rows_pad, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, rows_pad, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, rows_pad, 128), jnp.float32),
        ],
        **({'interpret': True} if interpret else {}),
    )(coef.reshape(b, 1, n_faces * 9), zw.reshape(b, 1, n_faces),
      color.reshape(b, 1, n_faces * 3))
    if rows_pad != rows:
        num, den, transp = (num[:, :, :rows], den[:, :rows],
                            transp[:, :rows])
    return num, den, transp


def _pallas_accum_bwd(coef, zw, color, gnum, gden, gtransp, *, res, cams,
                      interpret):
    b, _, n_faces = zw.shape
    rows = (res * res) // 128
    rows_pad, band = _band_plan(res)
    if rows_pad != rows:
        # padded pixel rows carry ZERO cotangents: their every gradient
        # contribution multiplies by g/gden/gtr = 0 in the kernel
        dp = rows_pad - rows
        gnum = jnp.pad(gnum, ((0, 0), (0, 0), (0, dp), (0, 0)))
        gden = jnp.pad(gden, ((0, 0), (0, dp), (0, 0)))
        gtransp = jnp.pad(gtransp, ((0, 0), (0, dp), (0, 0)))

    smem2 = lambda n: _smem_row_spec(cams, n, grid_dims=2)
    grow = pl.pallas_call(
        functools.partial(_accum_bwd_kernel, n_faces=n_faces, res=res,
                          band=band, cams=cams),
        grid=(b // cams, rows_pad // band),
        # the unrolled 128-face group keeps enough temporaries live that
        # the compiler's scoped-vmem STACK wants ~16.3 MB when this kernel
        # sits inside a larger jit (default limit 16 MB; measured overflow
        # 296 KB at res 64, B=4 -- tools/certify_compile_matrix.py); v5e
        # has far more physical VMEM, so raise the cap rather than split
        # the face loop
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        in_specs=[
            smem2(n_faces * 9),
            smem2(n_faces),
            smem2(n_faces * 3),
            pl.BlockSpec((cams, 3, band, 128), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cams, band, 128), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cams, band, 128), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        # the band grid dim revisits this block: accumulation across bands
        out_specs=pl.BlockSpec((cams, n_faces, 13, 128),
                               lambda i, j: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_faces, 13, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((n_faces, band, 128), jnp.float32),
            pltpu.VMEM((n_faces, band, 128), jnp.float32),
        ],
        **({'interpret': True} if interpret else {}),
    )(coef.reshape(b, 1, n_faces * 9), zw.reshape(b, 1, n_faces),
      color.reshape(b, 1, n_faces * 3), gnum, gden, gtransp)
    sums = jnp.sum(grow, axis=-1)                     # (B, F, 13)
    gcoef = sums[..., :9].reshape(b, n_faces, 3, 3)
    gzw = sums[..., 9][:, None, :]                    # matches zw (B, 1, F)
    gcolor = sums[..., 10:13]
    return gcoef, gzw, gcolor


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _soft_accum_core(coef, zw, color, res, cams, interpret):
    return _pallas_accum_fwd(coef, zw, color, res=res, cams=cams,
                             interpret=interpret)


def _accum_fwd(coef, zw, color, res, cams, interpret):
    out = _pallas_accum_fwd(coef, zw, color, res=res, cams=cams,
                            interpret=interpret)
    return out, (coef, zw, color)


def _accum_bwd(res, cams, interpret, residuals, cotangents):
    coef, zw, color = residuals
    gnum, gden, gtransp = cotangents
    return _pallas_accum_bwd(coef, zw, color, gnum, gden, gtransp,
                             res=res, cams=cams, interpret=interpret)


_soft_accum_core.defvjp(_accum_fwd, _accum_bwd)


def rasterize_softmax_pallas(verts: jnp.ndarray, faces: jnp.ndarray,
                             attrs: jnp.ndarray, res: int,
                             background: jnp.ndarray, sigma: float = 0.5,
                             gamma: float = 0.5, cams_per_program: int = 4,
                             interpret: bool = False) -> jnp.ndarray:
    """
    Drop-in Pallas equivalent of
    :func:`torchdrivesim_tpu.ops.rasterize.rasterize_softmax` for
    channels-LAST callers; differentiable w.r.t. verts, attrs, and
    background. Serves ANY face count (faces split into MAX_FACES-size
    kernel groups whose partial accumulators combine in XLA -- matching the
    reference's any-face-count soft blending,
    `torchdrivesim/rendering/pytorch3d.py:89-127`) and any resolution with
    ``res * res % 128 == 0`` (every multiple of 16; pixel bands bound VMEM).

    Args:
        verts: (B, V, 3) screen (row, col, priority z); faces: (B, F, 3);
        attrs: (B, V, 3) colors; background: (B, res, res, 3).
    Returns:
        (B, res, res, 3) image in [0, 1].
    """
    b, f = faces.shape[0], faces.shape[1]
    assert supports_soft(f, res), (f, res)
    if f == 0:
        return background
    coef, zw, color = _soft_coefficients(verts, faces, attrs, sigma, gamma)
    zw = zw[:, None, :]        # (B, 1, F): SMEM blocks need >=2 trailing
    #                            dims equal to the full array extents
    cams = min(cams_per_program, b)
    while b % cams:
        cams -= 1
    if f <= MAX_FACES and res <= 128:
        # single-group fast path: composite in-kernel, one kernel pair,
        # no accumulator images through HBM
        bg_chw = jnp.transpose(background, (0, 3, 1, 2))
        img = _soft_raster_core(coef, zw, color, bg_chw, res, cams, interpret)
        return jnp.transpose(img, (0, 2, 3, 1))

    # grouped path: pad to whole MAX_FACES groups (padding uses the same
    # degenerate-face sentinel C = -1e9, so alpha == 0 exactly)
    pad = (-f) % MAX_FACES
    if pad:
        pcoef = jnp.zeros((b, pad, 3, 3), coef.dtype).at[..., 2].set(-1e9)
        coef = jnp.concatenate([coef, pcoef], axis=1)
        zw = jnp.concatenate([zw, jnp.zeros((b, 1, pad), zw.dtype)], axis=2)
        color = jnp.concatenate([color, jnp.zeros((b, pad, 3), color.dtype)],
                                axis=1)
    n_groups = coef.shape[1] // MAX_FACES
    rows = (res * res) // 128
    num = jnp.zeros((b, 3, rows, 128), jnp.float32)
    den = jnp.zeros((b, rows, 128), jnp.float32)
    transp = jnp.ones((b, rows, 128), jnp.float32)
    for g in range(n_groups):
        lo, hi = g * MAX_FACES, (g + 1) * MAX_FACES
        ng, dg, tg = _soft_accum_core(coef[:, lo:hi], zw[:, :, lo:hi],
                                      color[:, lo:hi], res, cams, interpret)
        num = num + ng
        den = den + dg
        transp = transp * tg
    # composite (plain differentiable XLA, elementwise): same semantics as
    # the in-kernel epilogue and ops/rasterize.rasterize_softmax
    c_faces = num / jnp.maximum(den[:, None], 1e-8)
    cover = (1.0 - transp)[:, None]
    bg_chw = jnp.transpose(background, (0, 3, 1, 2)).reshape(b, 3, rows, 128)
    img = cover * c_faces + (1.0 - cover) * bg_chw
    return jnp.transpose(img.reshape(b, 3, res, res), (0, 2, 3, 1))
