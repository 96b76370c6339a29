"""
Pallas background-warp kernel: per-camera views of the baked map texture
with ZERO scalar gathers.

XLA lowers arbitrary gathers on TPU to scalar loops (~125M elements/s),
which made background texture sampling the render bottleneck. This kernel
exploits the structure of the problem: an orthographic camera view is an
AFFINE warp of the texture, and affine warps decompose into two axis-aligned
resampling passes (Catmull-Smith two-pass warping):

1. a 128x256 window of the right mip level around each camera is DMA'd
   HBM -> VMEM (row origin 8-aligned and camera-tight, lane origin
   128-aligned -- see WIN_ROWS / WINDOW);
2. pass 1 resamples rows with ``tpu.dynamic_gather`` along lanes -- the one
   vectorized gather Mosaic supports, applied per 128-lane slab;
3. pass 2 transposes and lane-gathers again; with only 128 window rows the
   standard branch's pass-2 table is a single 128-lane vreg slab, so this
   pass is ONE dynamic_gather (no slab select).

Rotations near +-90 deg make the first pass ill-conditioned (the classic
bottleneck problem); those cameras use the transposed window, selected per
camera by coefficient magnitude (the window is square, so the transpose is
a cheap in-VMEM op).

The texture is packed RGB8-in-uint32, so each pass moves ONE 32-bit value
per pixel; colors unpack after the final gather. Nearest-neighbor filtering
(within one texel of the exact sample); mip cell size must satisfy
``cell >= fov * 1.55 / 128`` so a 128-texel square covers the rotated view
even after the 8-aligned row-origin rounding.
"""
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from torchdrivesim_tpu.ops.grids import Grid2D

RES = 128        #: output resolution (== TPU lane width)
WINDOW = 256     #: texture window LANE count (origins align to 128 lanes, so
                 #: covering a view that may straddle an alignment boundary
                 #: needs 128 + 128 lanes)
#: texture window ROW count. Rows only need 8-sublane alignment (the DMA is
#: tile-granular at (8, 128)), so the row origin tracks the camera tightly:
#: the ``select_mip`` contract (MIP_FACTOR) bounds the rotated view's
#: half-extent at ``0.7071 / 1.55 * res <= 58.4`` texels; with nearest
#: rounding (+-0.5) and the +-4 texel 8-aligned origin rounding, 128 rows
#: always cover it (camera-to-origin distance lands in [59.5, 67.5], and
#: coverage needs [58.9, 68.1]). A 128-row window halves the DMA traffic of
#: the original square window AND makes every gather whose table is the
#: window's ROW axis a single 128-lane vreg slab.
WIN_ROWS = 128
#: mip-selection safety factor: the chosen level's cell must be at least
#: ``fov * MIP_FACTOR / res`` so the rotated view (diagonal 0.7071 * res
#: texels at 45 deg) plus all rounding slack fits the 128-row window.
MIP_FACTOR = 1.55


def build_mip_pyramid(texture: Grid2D, max_levels: int = 6):
    """
    Box-filtered mip pyramid of a float RGB texture, each level packed to
    uint32 (0x00BBGGRR) and padded so any 128-aligned window origin has a
    full WINDOW of addressable texels.

    Returns:
        list of packed Grid2D (int32 data (H, W, 1)) from fine to coarse.
    """
    data = np.asarray(texture.data, dtype=np.float32)
    origin = np.asarray(texture.origin, dtype=np.float64)
    cell = float(texture.cell_size)
    levels = []
    for _ in range(max_levels):
        h, w = data.shape[0], data.shape[1]
        q = np.clip(np.round(data * 255.0), 0, 255).astype(np.uint32)
        packed = (q[..., 0] | (q[..., 1] << 8) | (q[..., 2] << 16)).astype(np.int32)
        pad_h = int(np.ceil(h / 128)) * 128 + (WINDOW - 128) - h
        pad_w = int(np.ceil(w / 128)) * 128 + (WINDOW - 128) - w
        packed = np.pad(packed, ((0, max(pad_h, 0)), (0, max(pad_w, 0))))
        # host numpy: embedded as compile-time constants without a device
        # round trip (device closure constants force a D2H at lowering)
        levels.append(Grid2D(data=packed[..., None],
                             origin=origin.astype(np.float32),
                             cell_size=cell, valid_shape=(h, w)))
        if h // 2 < 8 or w // 2 < 8:
            break
        h2, w2 = (h // 2) * 2, (w // 2) * 2
        data = data[:h2, :w2].reshape(h2 // 2, 2, w2 // 2, 2, 3).mean(axis=(1, 3))
        # cell centers of the coarser grid sit midway between fine centers
        origin = origin + cell / 2
        cell *= 2
    return levels


def select_mip(levels, fov: float, res: int = RES):
    """Finest level whose ``res``-texel square covers the rotated view."""
    needed = fov * MIP_FACTOR / res
    for level in levels:
        if level.cell_size >= needed:
            return level
    return levels[-1]


def _gather_lanes(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """
    Vectorized gather along lanes from a table up to 256 wide: two 128-lane
    slabs combined by slab id (``tpu.dynamic_gather`` handles one vreg of
    lanes). For widths in (128, 256) the high slab OVERLAPS the low one
    (offset ``w - 128``) so both stay exactly 128 lanes wide -- the only
    table shape Mosaic's dynamic_gather is known-good on.

    Args:
        table: (R, w) with w <= 256; idx: (R, 128) int32 in [0, w).
    Returns:
        (R, 128) gathered values.
    """
    w = table.shape[-1]
    if w <= 128:
        return jnp.take_along_axis(table, jnp.clip(idx, 0, w - 1), axis=1)
    off = w - 128
    lo = jnp.take_along_axis(table[:, :128], jnp.clip(idx, 0, 127), axis=1)
    hi = jnp.take_along_axis(table[:, off:], jnp.clip(idx - off, 0, 127), axis=1)
    return jnp.where(idx < 128, lo, hi)


#: cameras per kernel program: the per-camera compute is tiny, so program
#: overhead and DMA latency dominate -- batching amortizes both (the window
#: copies are all started before the first camera's compute)
CAMS_PER_PROGRAM = 4


def warp_view_packed(fcoef_ref, icoef_ref, c, window_ref, dma, tmp_ref,
                     out_tmp_ref):
    """
    In-kernel two-pass warp of one camera's loaded ``(WIN_ROWS, WINDOW)``
    int32 texture window into its packed ``(RES, RES)`` RGB8 view
    (0x00BBGGRR); off-texture pixels get the packed background color. Shared
    by the standalone warp kernel and the fused warp+rasterize kernel.

    The standard branch resamples lanes first (pass-1 table = the window's
    256 lanes, one gather row per WINDOW ROW), then pass-2 gathers from the
    transposed pass-1 result -- a 128-wide table, i.e. ONE dynamic_gather
    slab. The ill-conditioned-rotation branch (``flip``, rotations near
    +-90 deg) transposes the window under ``@pl.when`` so only one branch
    executes: its pass-1 table is the window's 128 ROWS (single slab), its
    pass-2 the 256-row pass-1 output (two slabs). Both branches finish
    pass 2 locally into ``out_tmp_ref`` because their table widths differ.

    Args:
        fcoef_ref / icoef_ref: SMEM coefficient refs (see
            :func:`warp_background_pallas` for the layout), indexed at camera
            slot ``c``.
        window_ref: (WIN_ROWS, WINDOW) int32 texture window VMEM ref.
        dma: in-flight copy filling ``window_ref``; waited on only after the
            index math, so the copy overlaps compute.
        tmp_ref: (WINDOW, RES) int32 pass-1 scratch (sized for the flip
            branch; the standard branch uses its first WIN_ROWS rows).
        out_tmp_ref: (RES, RES) int32 pass-2 scratch, written TRANSPOSED.
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, (RES, RES), 0).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (RES, RES), 1).astype(jnp.float32)

    flip = icoef_ref[c, 0, 2]                    # 1 -> use transposed window
    bg_packed = icoef_ref[c, 0, 3]
    f = lambda k: fcoef_ref[c, 0, k]
    va, vb, vc = f(0), f(1), f(2)
    ha, hb, hc = f(3), f(4), f(5)
    ty_a, ty_b, ty_c = f(6), f(7), f(8)
    tx_a, tx_b, tx_c = f(9), f(10), f(11)
    h_tex, w_tex = f(12), f(13)

    def h_idx_on(shape, bound):
        # pass-1 indices on the (pass-1-row, output-col) grid: h(r', c)
        rr = jax.lax.broadcasted_iota(jnp.int32, shape, 0).astype(jnp.float32)
        cc = jax.lax.broadcasted_iota(jnp.int32, shape, 1).astype(jnp.float32)
        h = jnp.floor(ha * rr + hb * cc + hc + 0.5).astype(jnp.int32)
        return jnp.clip(h, 0, bound - 1)

    # pass-2 indices on the TRANSPOSED output grid (dim0 = c, dim1 = r):
    # v(r, c) with r = cols iota, c = rows iota
    v_idx_t = jnp.floor(va * cols + vb * rows + vc + 0.5).astype(jnp.int32)
    # validity in TEXTURE coordinates, evaluated at output (r, c)
    ty = ty_a * rows + ty_b * cols + ty_c
    tx = tx_a * rows + tx_b * cols + tx_c
    valid = (ty >= 0) & (ty < h_tex) & (tx >= 0) & (tx < w_tex)

    if dma is not None:
        dma.wait()

    @pl.when(flip == 1)
    def _():
        # pass-1 rows = window LANES; h indexes window ROWS (one slab)
        tmp_ref[:, :] = _gather_lanes(window_ref[:, :].T,
                                      h_idx_on((WINDOW, RES), WIN_ROWS))
        # pass-2 table = all WINDOW pass-1 rows (two slabs)
        out_tmp_ref[:, :] = _gather_lanes(
            tmp_ref[:, :].T, jnp.clip(v_idx_t, 0, WINDOW - 1))

    @pl.when(flip != 1)
    def _():
        # pass-1 rows = window ROWS; h indexes window LANES (two slabs)
        tmp_ref[0:WIN_ROWS, :] = _gather_lanes(
            window_ref[:, :], h_idx_on((WIN_ROWS, RES), WINDOW))
        # pass-2 table = the WIN_ROWS = 128 pass-1 rows: ONE gather slab
        out_tmp_ref[:, :] = _gather_lanes(
            tmp_ref[0:WIN_ROWS, :].T, jnp.clip(v_idx_t, 0, WIN_ROWS - 1))

    packed = out_tmp_ref[:, :].T
    return jnp.where(valid, packed, bg_packed)


def warp_view_bilinear(fcoef_ref, icoef_ref, c, window_ref, dma, tmp3_ref,
                       out3_ref):
    """
    Two-pass BILINEAR warp of one camera's texture window into three float
    ``(RES, RES)`` channel planes in [0, 1]; off-texture pixels get the
    background color. The diff-path forward: linear filtering makes the
    output piecewise-bilinear in the camera pose, so the image-space
    central differences that drive ``warp_background_diff``'s VJP measure
    a real derivative instead of nearest-filter staircase noise (measured
    on the baked Town02 texture: pose-gradient cosine vs the analytic
    mip-level bilinear reference rises from 0.81 mean / -0.78 min with the
    nearest forward to ~1 -- tools/diff_bias_check.py).

    Each pass lerps two axis-aligned ``tpu.dynamic_gather`` taps per
    channel (the exact Catmull-Smith two-pass linear filter; for an affine
    warp the composite interpolates the same texel grid with a sheared --
    still C0, exact-at-texel-centers -- bilinear kernel).

    Args:
        tmp3_ref: (3, WINDOW, RES) float pass-1 scratch.
        out3_ref: (3, RES, RES) float pass-2 scratch, written TRANSPOSED.
    Returns:
        list of three (RES, RES) float planes (row-major output layout).
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, (RES, RES), 0).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (RES, RES), 1).astype(jnp.float32)

    flip = icoef_ref[c, 0, 2]
    bg_packed = icoef_ref[c, 0, 3]
    f = lambda k: fcoef_ref[c, 0, k]
    va, vb, vc = f(0), f(1), f(2)
    ha, hb, hc = f(3), f(4), f(5)
    ty_a, ty_b, ty_c = f(6), f(7), f(8)
    tx_a, tx_b, tx_c = f(9), f(10), f(11)
    h_tex, w_tex = f(12), f(13)

    def h_on(shape):
        rr = jax.lax.broadcasted_iota(jnp.int32, shape, 0).astype(jnp.float32)
        cc = jax.lax.broadcasted_iota(jnp.int32, shape, 1).astype(jnp.float32)
        return ha * rr + hb * cc + hc

    # pass-2 position on the TRANSPOSED output grid (dim0 = c, dim1 = r)
    v_t = va * cols + vb * rows + vc
    ty = ty_a * rows + ty_b * cols + ty_c
    tx = tx_a * rows + tx_b * cols + tx_c
    valid = (ty >= 0) & (ty < h_tex) & (tx >= 0) & (tx < w_tex)

    if dma is not None:
        dma.wait()

    def lerp_gather(table, pos, bound):
        i0 = jnp.clip(jnp.floor(pos), 0, bound - 2).astype(jnp.int32)
        fr = jnp.clip(pos - i0.astype(jnp.float32), 0.0, 1.0)
        g0 = _gather_lanes(table, i0)
        g1 = _gather_lanes(table, i0 + 1)
        return g0 + fr * (g1 - g0)

    packed = window_ref[:, :]
    inv255 = 1.0 / 255.0
    chans = [(packed & 0xFF).astype(jnp.float32) * inv255,
             ((packed >> 8) & 0xFF).astype(jnp.float32) * inv255,
             ((packed >> 16) & 0xFF).astype(jnp.float32) * inv255]

    @pl.when(flip == 1)
    def _():
        # pass-1 rows = window LANES; positions index window ROWS (128-wide
        # tables, one gather slab per tap)
        h = h_on((WINDOW, RES))
        for ch in range(3):
            tmp3_ref[ch] = lerp_gather(chans[ch].T, h, WIN_ROWS)
        # pass-2 table = all WINDOW pass-1 rows (two slabs per tap)
        for ch in range(3):
            out3_ref[ch] = lerp_gather(tmp3_ref[ch].T, v_t, WINDOW)

    @pl.when(flip != 1)
    def _():
        # pass-1 rows = window ROWS; positions index window LANES (two
        # slabs per tap)
        h = h_on((WIN_ROWS, RES))
        for ch in range(3):
            tmp3_ref[ch, 0:WIN_ROWS, :] = lerp_gather(chans[ch], h, WINDOW)
        # pass-2 table = the WIN_ROWS = 128 pass-1 rows: one slab per tap
        for ch in range(3):
            out3_ref[ch] = lerp_gather(tmp3_ref[ch, 0:WIN_ROWS, :].T, v_t,
                                       WIN_ROWS)

    bgc = [((bg_packed >> s) & 0xFF).astype(jnp.float32) * inv255
           for s in (0, 8, 16)]
    return [jnp.where(valid, out3_ref[ch][:, :].T, bgc[ch])
            for ch in range(3)]


def _warp_bilinear_kernel(fcoef_ref, icoef_ref, tex_ref, out_ref, win_ref,
                          sem, tmp3_ref, out3_ref, *, cams, res=RES):
    dmas = [start_window_dma(icoef_ref, c, tex_ref, win_ref.at[c], sem.at[c])
            for c in range(cams)]
    for c in range(cams):
        planes = warp_view_bilinear(fcoef_ref, icoef_ref, c, win_ref.at[c],
                                    dmas[c], tmp3_ref=tmp3_ref,
                                    out3_ref=out3_ref)
        for ch in range(3):
            out_ref[c, ch] = planes[ch][:res, :res] if res != RES \
                else planes[ch]


def warp_background_bilinear(mip: Grid2D, cam_xy: jnp.ndarray,
                             cam_sc: jnp.ndarray, scale: float,
                             background_color: jnp.ndarray,
                             left_handed: bool = False,
                             res: int = RES) -> jnp.ndarray:
    """Per-camera background views via the two-pass BILINEAR warp kernel
    (same contract as :func:`warp_background_pallas`; linear filtering,
    ~2x the gathers). The forward of the differentiable fast path."""
    b = cam_xy.shape[0]
    fcoef, icoef = warp_coefficients(mip, cam_xy, cam_sc, scale,
                                     background_color, left_handed, res=res)
    cams = min(CAMS_PER_PROGRAM, b)
    b_pad = -(-b // cams) * cams
    if b_pad != b:
        pad = ((0, b_pad - b), (0, 0), (0, 0))
        fcoef = jnp.pad(fcoef, pad, mode='edge')
        icoef = jnp.pad(icoef, pad, mode='edge')

    out = pl.pallas_call(
        functools.partial(_warp_bilinear_kernel, cams=cams, res=res),
        grid=(b_pad // cams,),
        in_specs=[
            pl.BlockSpec((cams, 1, 14), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((cams, 1, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((cams, 3, res, res), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, 3, res, res), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((cams, WIN_ROWS, WINDOW), jnp.int32),
            pltpu.SemaphoreType.DMA((cams,)),
            pltpu.VMEM((3, WINDOW, RES), jnp.float32),
            pltpu.VMEM((3, RES, RES), jnp.float32),
        ],
    )(fcoef, icoef, mip.data[..., 0])
    if b_pad != b:
        out = out[:b]
    return out


def start_window_dma(icoef_ref, c, tex_ref, win_ref, sem):
    """Kick off the HBM -> VMEM copy of camera ``c``'s texture window
    (WIN_ROWS sublane-aligned rows x WINDOW lane-aligned lanes)."""
    oy = pl.multiple_of(icoef_ref[c, 0, 0], 8)
    ox = pl.multiple_of(icoef_ref[c, 0, 1], 128)
    dma = pltpu.make_async_copy(
        tex_ref.at[pl.ds(oy, WIN_ROWS), pl.ds(ox, WINDOW)], win_ref, sem)
    dma.start()
    return dma


def _warp_kernel(fcoef_ref, icoef_ref, tex_ref, out_ref, win_ref, sem,
                 tmp_ref, out_tmp_ref, *, cams, res=RES):
    # start ALL window DMAs up front so the copies overlap camera compute
    dmas = [start_window_dma(icoef_ref, c, tex_ref, win_ref.at[c], sem.at[c])
            for c in range(cams)]

    for c in range(cams):
        packed = warp_view_packed(fcoef_ref, icoef_ref, c, win_ref.at[c],
                                  dmas[c], tmp_ref=tmp_ref,
                                  out_tmp_ref=out_tmp_ref)
        if res != RES:
            # the warp always computes a full 128-lane view; smaller outputs
            # take the top-left block (coefficients map pixels < res)
            packed = packed[:res, :res]
        inv255 = 1.0 / 255.0
        out_ref[c, 0] = (packed & 0xFF).astype(jnp.float32) * inv255
        out_ref[c, 1] = ((packed >> 8) & 0xFF).astype(jnp.float32) * inv255
        out_ref[c, 2] = ((packed >> 16) & 0xFF).astype(jnp.float32) * inv255


def warp_coefficients(mip: Grid2D, cam_xy: jnp.ndarray, cam_sc: jnp.ndarray,
                      scale: float, background_color: jnp.ndarray,
                      left_handed: bool = False, res: int = RES):
    """
    Per-camera affine coefficients for the two-pass warp kernel.

    Returns:
        (fcoef (B, 1, 14) float32, icoef (B, 1, 4) int32) SMEM operands:
        fcoef rows hold the pass-2/pass-1/validity affine coefficients and
        the true texture bounds; icoef rows hold the 128-aligned window
        origin, the transpose flag, and the packed background color.
    """
    b = cam_xy.shape[0]
    assert res <= RES, "the 256-texel window only covers views up to 128 px"
    half = res / 2.0
    ppm = scale * half                      # output pixels per meter
    cell = float(mip.cell_size)
    h_pad = mip.data.shape[0]
    w_pad = mip.data.shape[1]
    sin = cam_sc[:, 0]
    cos = cam_sc[:, 1]
    lh = -1.0 if left_handed else 1.0

    # texture coordinates of output pixel (r, c), pixel centers at +0.5:
    #   forward = (half - (r+.5))/ppm ; left = lh*(half - (c+.5))/ppm
    #   world = cam + R(psi) @ (forward, left)
    #   ty/tx = (world_y/x - origin_y/x) / cell   (ty ~ texture row)
    m = 1.0 / (ppm * cell)
    h0 = half - 0.5
    a_y = -sin * m
    b_y = -lh * cos * m
    a_x = -cos * m
    b_x = lh * sin * m
    origin = mip.origin
    e_y = (cam_xy[:, 1] - origin[1]) / cell + m * h0 * (sin + lh * cos)
    e_x = (cam_xy[:, 0] - origin[0]) / cell + m * h0 * (cos - lh * sin)

    # window origins: lanes align to 128 (so covering a view that may
    # straddle an alignment boundary needs the full 256-lane window), rows
    # only to the 8-row sublane tile. Centering the rounding at
    # (WIN_ROWS - 1) / 2 puts the camera 59.5..67.5 texels from the origin;
    # the MIP_FACTOR contract bounds the view half-extent (with nearest
    # rounding) at 58.9 texels, so [59.5, 67.5] sits inside the coverage
    # interval [58.9, WIN_ROWS - 1 - 58.9] = [58.9, 68.1]
    cy = (cam_xy[:, 1] - origin[1]) / cell
    cx = (cam_xy[:, 0] - origin[0]) / cell
    oy = 8 * jnp.round((cy - (WIN_ROWS - 1) / 2.0) / 8.0).astype(jnp.int32)
    ox = 128 * jnp.round((cx - 128.0) / 128.0).astype(jnp.int32)
    oy = jnp.clip(oy, 0, max(h_pad - WIN_ROWS, 0))
    ox = jnp.clip(ox, 0, max(w_pad - WINDOW, 0))

    # window coordinates: yw = ty - oy, xw = tx - ox
    a1, b1 = a_y, b_y
    e1 = e_y - oy.astype(jnp.float32)
    a2, b2 = a_x, b_x
    e2 = e_x - ox.astype(jnp.float32)

    # two-pass decomposition out[r,c] = W[v(r,c), h(v(r,c), c)]:
    #   standard branch:  v = yw ;  h(r',c) = (a2/a1) r' + (b2 - a2 b1/a1) c
    #                                         + (e2 - a2 e1/a1)
    #   flipped branch (|a1| < |a2|): transpose the window and swap roles
    use_flip = jnp.abs(a1) < jnp.abs(a2)
    pa1 = jnp.where(use_flip, a2, a1)
    pb1 = jnp.where(use_flip, b2, b1)
    pe1 = jnp.where(use_flip, e2, e1)
    pa2 = jnp.where(use_flip, a1, a2)
    pb2 = jnp.where(use_flip, b1, b2)
    pe2 = jnp.where(use_flip, e1, e2)
    safe = jnp.where(jnp.abs(pa1) < 1e-9, 1e-9, pa1)
    h_a = pa2 / safe
    h_b = pb2 - pa2 * pb1 / safe
    h_c = pe2 - pa2 * pe1 / safe
    # v(r, c) = pa1 r + pb1 c + pe1; the kernel evaluates it on the
    # TRANSPOSED output grid where dim0 = c and dim1 = r
    v_a = pa1                              # multiplies the 'cols' iota (= r)
    v_b = pb1                              # multiplies the 'rows' iota (= c)
    v_c = pe1

    bg = jnp.clip(jnp.asarray(background_color) * 255.0, 0, 255).astype(jnp.uint32)
    bg_packed = (bg[0] | (bg[1] << 8) | (bg[2] << 16)).astype(jnp.int32)

    # true (unpadded) texture bounds for the validity mask
    valid = mip.valid_shape or (h_pad, w_pad)
    h_tex = float(valid[0])
    w_tex = float(valid[1])

    fcoef = jnp.stack([
        v_a, v_b, v_c, h_a, h_b, h_c,
        jnp.broadcast_to(a_y, (b,)), jnp.broadcast_to(b_y, (b,)), e_y,
        jnp.broadcast_to(a_x, (b,)), jnp.broadcast_to(b_x, (b,)), e_x,
        jnp.full((b,), h_tex), jnp.full((b,), w_tex),
    ], axis=-1).astype(jnp.float32)[:, None, :]            # (B, 1, 14)
    icoef = jnp.stack([
        oy, ox, use_flip.astype(jnp.int32),
        jnp.broadcast_to(bg_packed, (b,)),
    ], axis=-1).astype(jnp.int32)[:, None, :]              # (B, 1, 4)
    return fcoef, icoef


def warp_background_pallas(mip: Grid2D, cam_xy: jnp.ndarray, cam_sc: jnp.ndarray,
                           scale: float, background_color: jnp.ndarray,
                           left_handed: bool = False,
                           res: int = RES) -> jnp.ndarray:
    """
    Per-camera background views via the two-pass affine warp kernel.

    Args:
        mip: packed int32 texture level (see :func:`build_mip_pyramid`);
            ``mip.cell_size`` must be >= fov * MIP_FACTOR / res.
        cam_xy: (B, 2); cam_sc: (B, 2) (sin, cos); scale: 2 / fov.
        background_color: (3,) in [0, 1] for off-map pixels.
        res: output resolution, <= 128 (the kernel computes a full 128-lane
            view and slices; the window always covers it).
    Returns:
        (B, 3, res, res) float image in [0, 1].
    """
    b = cam_xy.shape[0]
    fcoef, icoef = warp_coefficients(mip, cam_xy, cam_sc, scale,
                                     background_color, left_handed, res=res)

    cams = min(CAMS_PER_PROGRAM, b)
    b_pad = -(-b // cams) * cams
    if b_pad != b:
        pad = ((0, b_pad - b), (0, 0), (0, 0))
        fcoef = jnp.pad(fcoef, pad, mode='edge')
        icoef = jnp.pad(icoef, pad, mode='edge')

    out = pl.pallas_call(
        functools.partial(_warp_kernel, cams=cams, res=res),
        grid=(b_pad // cams,),
        in_specs=[
            pl.BlockSpec((cams, 1, 14), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((cams, 1, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((cams, 3, res, res), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, 3, res, res), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((cams, WIN_ROWS, WINDOW), jnp.int32),
            pltpu.SemaphoreType.DMA((cams,)),
            pltpu.VMEM((WINDOW, RES), jnp.int32),
            pltpu.VMEM((RES, RES), jnp.int32),
        ],
    )(fcoef, icoef, mip.data[..., 0])
    if b_pad != b:
        out = out[:b]
    return out


def _sample_positions(mip: Grid2D, cam_xy: jnp.ndarray, cam_sc: jnp.ndarray,
                      scale: float, res: int = RES,
                      left_handed: bool = False):
    """
    The warp's texel sampling map as plain differentiable XLA: output pixel
    (r, c) of camera ``i`` reads the texture at ``(ty[i,r,c], tx[i,r,c])``
    (same affine as :func:`warp_coefficients`, before nearest rounding).

    Returns:
        ty, tx: (B, res, res) float32 texel coordinates.
    """
    half = res / 2.0
    ppm = scale * half
    cell = float(mip.cell_size)
    sin = cam_sc[:, 0:1, None]
    cos = cam_sc[:, 1:2, None]
    lh = -1.0 if left_handed else 1.0
    m = 1.0 / (ppm * cell)
    h0 = half - 0.5
    origin = mip.origin
    r = jax.lax.broadcasted_iota(jnp.float32, (1, res, res), 1)
    c = jax.lax.broadcasted_iota(jnp.float32, (1, res, res), 2)
    e_y = (cam_xy[:, 1:2, None] - origin[1]) / cell + m * h0 * (sin + lh * cos)
    e_x = (cam_xy[:, 0:1, None] - origin[0]) / cell + m * h0 * (cos - lh * sin)
    ty = (-sin * m) * r + (-lh * cos * m) * c + e_y
    tx = (-cos * m) * r + (lh * sin * m) * c + e_x
    return ty, tx


def warp_background_diff(mip: Grid2D, cam_xy: jnp.ndarray,
                         cam_sc: jnp.ndarray, scale: float,
                         background_color: jnp.ndarray,
                         left_handed: bool = False,
                         res: int = RES) -> jnp.ndarray:
    """
    Differentiable fast background: the BILINEAR mip warp kernel forward
    with a custom VJP for the camera pose.

    Why: the IL workload's dominant cost was the full-res bilinear
    background sample (one scattered XLA gather per pixel, the TPU gather
    floor -- 33 of the 52 ms config-4 train step at B=16). The reference
    gets its background pose-gradient through soft-rasterized road FACES
    (`torchdrivesim/rendering/pytorch3d.py:89-127`); ours comes from the
    baked texture, whose bilinear position-derivative IS the adjacent-texel
    difference. The backward therefore estimates the texture-space gradient
    with image-space central differences of the (saved) forward output
    mapped through the inverse affine Jacobian, and chains to
    ``cam_xy``/``cam_sc`` via ``jax.vjp`` of the sampling-position map --
    no kernel, no scatter, and the expensive gather never happens.

    The forward uses LINEAR filtering (:func:`warp_background_bilinear`,
    unlike the hard path's nearest filter) so the output is piecewise-
    bilinear in pose and the central differences measure a real local
    derivative; with a nearest forward they measure staircase noise on
    piecewise-constant map textures (measured: tools/diff_bias_check.py,
    stats in docs/design.md). The gradient is that of the MIP-LEVEL image
    -- the image actually rendered -- i.e. a box-filtered (smoothed)
    version of the full-res texture gradient; for exact full-resolution
    bilinear gradients opt out via ``diff_fast_background=False``.

    The texture and background color are treated as constants (map assets;
    nothing trains them).

    Returns:
        (B, 3, res, res) float image in [0, 1]; differentiable w.r.t.
        ``cam_xy`` and ``cam_sc``.
    """
    cell = float(mip.cell_size)
    lh = -1.0 if left_handed else 1.0
    m = 1.0 / (scale * (res / 2.0) * cell)
    valid = mip.valid_shape or (mip.data.shape[0], mip.data.shape[1])
    h_tex, w_tex = float(valid[0]), float(valid[1])

    # NOTE: every traced value must be an explicit argument of the
    # custom_vjp function -- under jit, even constant jnp math stages as a
    # tracer, and a tracer captured by the closure escapes the trace when
    # the bwd runs (UnexpectedTracerError under jax.checkpoint).
    from jax.ad_checkpoint import checkpoint_name

    @jax.custom_vjp
    def core(cxy, csc, bg):
        out = warp_background_bilinear(mip, cxy, csc, scale, bg,
                                       left_handed=left_handed, res=res)
        # named INSIDE the custom_vjp so a `jax.checkpoint` policy saving
        # 'tds_bg_warp' saves the very tensor the VJP keeps as its residual
        # -- naming outside would save a copy while the residual (and so
        # the kernel re-run) stayed on the remat path (utils.il_remat_policy)
        return checkpoint_name(out, 'tds_bg_warp')

    def fwd(cxy, csc, bg):
        out = core(cxy, csc, bg)
        return out, (out, cxy, csc, bg)

    def bwd(resid, g):
        out, cxy, csc, bg = resid

        def ddim(img, axis):
            # central differences, one-sided at the edges (per channel)
            lo = jax.lax.slice_in_dim(img, 0, -2, axis=axis)
            hi = jax.lax.slice_in_dim(img, 2, None, axis=axis)
            first = (jax.lax.slice_in_dim(img, 1, 2, axis=axis)
                     - jax.lax.slice_in_dim(img, 0, 1, axis=axis))
            last = (jax.lax.slice_in_dim(img, -1, None, axis=axis)
                    - jax.lax.slice_in_dim(img, -2, -1, axis=axis))
            return jnp.concatenate([first, (hi - lo) * 0.5, last], axis=axis)

        dIdr = ddim(out, 2)                       # (B, 3, res, res)
        dIdc = ddim(out, 3)
        sin = csc[:, 0, None, None, None]
        cos = csc[:, 1, None, None, None]
        # invert [dIdr dIdc] = [dTty dTtx] @ [[a_y, b_y], [a_x, b_x]]
        a_y, b_y = -sin * m, -lh * cos * m
        a_x, b_x = -cos * m, lh * sin * m
        det = a_y * b_x - a_x * b_y               # = -lh * m**2, never 0
        dTty = (dIdr * b_x - dIdc * a_x) / det
        dTtx = (dIdc * a_y - dIdr * b_y) / det

        def pos(cxy_, csc_):
            return _sample_positions(mip, cxy_, csc_, scale, res=res,
                                     left_handed=left_handed)

        (ty, tx), pos_vjp = jax.vjp(pos, cxy, csc)
        ok = ((ty >= 0) & (ty < h_tex) & (tx >= 0) & (tx < w_tex)
              ).astype(jnp.float32)
        cot_ty = jnp.sum(g * dTty, axis=1) * ok
        cot_tx = jnp.sum(g * dTtx, axis=1) * ok
        gxy, gsc = pos_vjp((cot_ty, cot_tx))
        # the background color is config data, treated as a constant
        return gxy, gsc, jnp.zeros_like(bg)

    core.defvjp(fwd, bwd)
    return core(cam_xy, cam_sc, jnp.asarray(background_color, jnp.float32))
