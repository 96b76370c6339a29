"""
Fused warp + rasterize Pallas kernel: one program per camera produces the
final composited BEV frame, with no background image ever touching HBM.

The split pipeline (``ops/pallas_warp.py`` then ``ops/pallas_rasterize.py``)
pays a (B, 3, 128, 128) float32 HBM round trip for the background plus a
whole extra kernel's program overhead. Fusing them removes both, and lets
the texture-window DMA overlap the primitive math (the prims don't need the
window): the program kicks off its window copy, resolves the per-band
packed prim winners while the copy is in flight, then warps the window and
composites bands in one pass.

Layout note: since round 5 the prim math runs on 2D ``(rows, res)``
tiles with per-prim scalar coefficients read from flattened lane-aligned
SMEM views (``_fused_cameras_2d``) -- measured 32% faster than the
original flat ``(1, PIXELS_PER_TILE)`` broadcast-FMA form once the SMEM
operands stopped paying Mosaic's trailing-dim tile padding, and the
winner is born in the warp's (RES, RES) layout so no relayout remains.
The flat path is kept behind ``TDS_FUSED_FLAT=1`` for A/B.

Replaces the composite step of the reference's renderer stack
(`torchdrivesim/rendering/pytorch3d.py:89-127`), which rasterizes the full
static + dynamic mesh every frame instead of warping a baked background.
"""
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from torchdrivesim_tpu.ops.grids import Grid2D
from torchdrivesim_tpu.ops.pallas_rasterize import (
    PIXELS_PER_TILE, _prep_prims, band_rows,
)
from torchdrivesim_tpu.ops.pallas_warp import (
    RES, WIN_ROWS, WINDOW, start_window_dma, warp_coefficients,
    warp_view_packed,
)

#: cameras per fused program: the per-camera work is a few microseconds, so
#: per-program fixed costs and DMA latency are worth amortizing (same
#: reasoning as the standalone warp kernel's CAMS_PER_PROGRAM)
CAMS_PER_PROGRAM = int(os.environ.get('TDS_FUSED_CAMS', '4'))

#: the 2D SMEM-scalar prim path is the DEFAULT at every resolution since
#: round 5: the SMEM operand flattening made it 32% faster than the flat
#: (1, 4096) relayout path at the headline config (295.7k -> 389.6k
#: env-steps/s, bit-identical output -- tools/probe_fused_2d.py);
#: TDS_FUSED_FLAT=1 restores the flat path (res 128 only) for A/B.
_FORCE_FLAT = os.environ.get('TDS_FUSED_FLAT') == '1'
#: experiment knob (timing-only ablations; wrong pixels): '' | 'nowarp' |
#: 'nobest' | 'nobranch' | 'empty' | 'skip' (no pallas_call at all --
#: isolates program-launch + output-write overhead vs 'empty') |
#: 'skipprep' (no pallas_call but the operand prep stays live --
#: 'skipprep' minus 'skip' is the prep cost)
_ABLATE = os.environ.get('TDS_FUSED_ABLATE', '')
#: experiment knob: prim chunk size for the @pl.when occupancy masking
#: (finer chunks skip more dead prims but emit more branches)
_CHUNK = int(os.environ.get('TDS_FUSED_CHUNK', '8'))
#: experiment knob: per-camera warp scratch (tmp/out_tmp) -- breaks the
#: cross-camera serialization on the shared buffers so camera c+1's prim
#: math can overlap camera c's warp (VMEM cost: cams x ~0.75 MB)
_PRIVSCRATCH = os.environ.get('TDS_FUSED_PRIVSCRATCH') == '1'


def _fused_kernel(fcoef_ref, icoef_ref, qm_ref, tm_ref, qcoef_ref, qpk_ref,
                  tcoef_ref, tpk_ref, tex_ref, out_ref, win_ref, sem,
                  best_ref, tmp_ref, out_tmp_ref, *, res, qp, tp, chunk, n_bands, cams,
                  packed_out=False, use_2d=False):
    """``cams`` cameras per program: banded prim winners (flat tiles,
    chunk-masked via ``@pl.when`` as in ``_raster_kernel_prims_masked``),
    then warp + composite in the 2D layout. All window DMAs start before
    any camera's prim math so the copies hide behind compute; batching
    cameras amortizes per-program fixed costs (scratch init, grid setup)."""
    if _ABLATE == 'empty':
        for c in range(cams):
            if packed_out:
                out_ref[c] = jnp.zeros((res, res), jnp.int32)
            else:
                out_ref[c] = jnp.zeros((3, res, res), jnp.float32)
        return

    dmas = [start_window_dma(icoef_ref, c, tex_ref, win_ref.at[c], sem.at[c])
            for c in range(cams)]

    sentinel = np.int32(0x7FFFFFFF)
    inv255 = 1.0 / 255.0
    rpb = band_rows(res)                         # rows per band

    if res != RES or use_2d:
        # DEFAULT: prim winners resolve on 2D (rpb, res) tiles from
        # SMEM-scalar coefficients (32% faster than the flat relayout
        # path at res 128 after the SMEM flattening; the only path at
        # res < 128, whose (1, PIXELS) -> (rpb, res) relayout Mosaic
        # rejects for non-128 lane counts)
        _fused_cameras_2d(fcoef_ref, icoef_ref, qm_ref, tm_ref, qcoef_ref,
                          qpk_ref, tcoef_ref, tpk_ref, out_ref, win_ref,
                          best_ref, tmp_ref, out_tmp_ref, dmas, res=res, qp=qp, tp=tp,
                          chunk=chunk, n_bands=n_bands, cams=cams,
                          packed_out=packed_out)
        return

    for c in range(cams):
        if _ABLATE != 'nobest':
            best_ref[:, :] = jnp.full((n_bands, PIXELS_PER_TILE), sentinel,
                                      jnp.int32)
        for j in range(n_bands if _ABLATE != 'nobest' else 0):
            base = j * PIXELS_PER_TILE
            idx = jax.lax.broadcasted_iota(
                jnp.int32, (1, PIXELS_PER_TILE), 1) + base
            px = (idx // res).astype(jnp.float32) + 0.5
            py = (idx % res).astype(jnp.float32) + 0.5

            def affine(cf, px=px, py=py):
                return cf[:, 0:1] * px + cf[:, 1:2] * py + cf[:, 2:3]

            def when(cond):
                if _ABLATE == 'nobranch':
                    return lambda fn: fn()
                return pl.when(cond)

            for ci, s in enumerate(range(0, qp, chunk)):
                @when(qm_ref[c, 0, j * (qp // chunk) + ci] != 0)
                def _(s=s, j=j, c=c, affine=affine):
                    g = jnp.maximum(
                        jnp.abs(affine(qcoef_ref[c, 0, s:s + chunk])),
                        jnp.abs(affine(qcoef_ref[c, 1, s:s + chunk])))
                    qv = jnp.where(g <= 0.5, qpk_ref[c, s:s + chunk],
                                   sentinel)
                    best_ref[j:j + 1, :] = jnp.minimum(
                        best_ref[j:j + 1, :],
                        jnp.min(qv, axis=0, keepdims=True))

            for ci, s in enumerate(range(0, tp, chunk)):
                @when(tm_ref[c, 0, j * (tp // chunk) + ci] != 0)
                def _(s=s, j=j, c=c, affine=affine):
                    emin = jnp.minimum(
                        jnp.minimum(affine(tcoef_ref[c, 0, s:s + chunk]),
                                    affine(tcoef_ref[c, 1, s:s + chunk])),
                        affine(tcoef_ref[c, 2, s:s + chunk]))
                    tv = jnp.where(emin >= 0, tpk_ref[c, s:s + chunk],
                                   sentinel)
                    best_ref[j:j + 1, :] = jnp.minimum(
                        best_ref[j:j + 1, :],
                        jnp.min(tv, axis=0, keepdims=True))

        # warp the texture window (DMA waited inside, after the index math)
        if _ABLATE == 'nowarp':
            dmas[c].wait()
            bg2d = win_ref[c, :, :RES]
        else:
            tr = tmp_ref.at[c] if _PRIVSCRATCH else tmp_ref
            otr = out_tmp_ref.at[c] if _PRIVSCRATCH else out_tmp_ref
            bg2d = warp_view_packed(fcoef_ref, icoef_ref, c, win_ref.at[c],
                                    dmas[c], tmp_ref=tr,
                                    out_tmp_ref=otr)

        if _ABLATE == 'nocomp':
            out_ref[c, 0, :, :] = bg2d.astype(jnp.float32)
            out_ref[c, 1, :, :] = bg2d.astype(jnp.float32)
            out_ref[c, 2, :, :] = bg2d.astype(jnp.float32)
            continue
        # composite per band in the 2D layout; prim pack is rank<<24 |
        # R<<16 | G<<8 | B, background pack is 0x00BBGGRR
        for j in range(n_bands):
            best = best_ref[j:j + 1, :].reshape(rpb, res)
            covered = best < (127 << 24)         # valid ranks <= 126
            bg = bg2d[j * rpb:(j + 1) * rpb, :]
            lo, hi = j * rpb, (j + 1) * rpb
            if packed_out:
                # emit 0x00BBGGRR directly: a third of the HBM traffic of
                # the 3-channel float image, decoded lazily by the consumer
                prim = (((best >> 16) & 255) | (best & 0xFF00)
                        | ((best & 255) << 16))
                out_ref[c, lo:hi, :] = jnp.where(covered, prim, bg)
            else:
                r = jnp.where(covered, (best >> 16) & 255, bg & 255)
                g = jnp.where(covered, (best >> 8) & 255, (bg >> 8) & 255)
                b = jnp.where(covered, best & 255, (bg >> 16) & 255)
                out_ref[c, 0, lo:hi, :] = r.astype(jnp.float32) * inv255
                out_ref[c, 1, lo:hi, :] = g.astype(jnp.float32) * inv255
                out_ref[c, 2, lo:hi, :] = b.astype(jnp.float32) * inv255


def _fused_cameras_2d(fcoef_ref, icoef_ref, qm_ref, tm_ref, qcoef_ref,
                      qpk_ref, tcoef_ref, tpk_ref, out_ref, win_ref,
                      best_ref, tmp_ref, out_tmp_ref, dmas, *, res, qp, tp, chunk,
                      n_bands, cams, packed_out=False):
    """Per-camera winner resolution + composite on 2D tiles -- the
    DEFAULT path at every resolution since round 5.

    Identical winner semantics to the flat path, but the per-band affine
    evaluation runs on 2D ``(rows_per_band, res)`` tiles driven by SMEM
    scalar coefficients (the prim tensors are staged to SMEM for this path;
    Mosaic has no lowering for the flat path's (chunk, 1) vector broadcast
    in 3D), so ``best`` is born in the image layout and composites against
    the warped background with no relayout. Costs half the vreg lanes at
    res=64 -- still far cheaper than the per-pixel background gather it
    replaces."""
    sentinel = np.int32(0x7FFFFFFF)
    inv255 = 1.0 / 255.0
    rpb = band_rows(res)                         # rows per band

    def when(cond):
        if _ABLATE == 'nobranch':
            return lambda fn: fn()
        return pl.when(cond)

    for c in range(cams):
        best_ref[:, :] = jnp.full((res, res), sentinel, jnp.int32)
        for j in range(n_bands if _ABLATE != 'nobest' else 0):
            lo, hi = j * rpb, (j + 1) * rpb
            px = jax.lax.broadcasted_iota(
                jnp.int32, (rpb, res), 0).astype(jnp.float32) + (lo + 0.5)
            py = jax.lax.broadcasted_iota(
                jnp.int32, (rpb, res), 1).astype(jnp.float32) + 0.5

            for ci, s in enumerate(range(0, qp, chunk)):
                # flattened SMEM views: qcoef (cams, 1, 2*qp*3) indexed
                # [(e*qp + p)*3 + k], qpk (cams, 1, qp), masks
                # (cams, 1, n_bands*chunks) -- see _render_coefs_fused
                @when(qm_ref[c, 0, j * (qp // chunk) + ci] != 0)
                def _(s=s, j=j, c=c, lo=lo, hi=hi, px=px, py=py):
                    acc = best_ref[lo:hi, :]
                    for p in range(s, s + chunk):
                        e0 = (qcoef_ref[c, 0, p * 3 + 0] * px
                              + qcoef_ref[c, 0, p * 3 + 1] * py
                              + qcoef_ref[c, 0, p * 3 + 2])
                        e1 = (qcoef_ref[c, 0, (qp + p) * 3 + 0] * px
                              + qcoef_ref[c, 0, (qp + p) * 3 + 1] * py
                              + qcoef_ref[c, 0, (qp + p) * 3 + 2])
                        g = jnp.maximum(jnp.abs(e0), jnp.abs(e1))
                        acc = jnp.minimum(acc, jnp.where(
                            g <= 0.5, qpk_ref[c, 0, p], sentinel))
                    best_ref[lo:hi, :] = acc

            for ci, s in enumerate(range(0, tp, chunk)):
                @when(tm_ref[c, 0, j * (tp // chunk) + ci] != 0)
                def _(s=s, j=j, c=c, lo=lo, hi=hi, px=px, py=py):
                    acc = best_ref[lo:hi, :]
                    for p in range(s, s + chunk):
                        emin = jnp.minimum(
                            jnp.minimum(
                                tcoef_ref[c, 0, p * 3 + 0] * px
                                + tcoef_ref[c, 0, p * 3 + 1] * py
                                + tcoef_ref[c, 0, p * 3 + 2],
                                tcoef_ref[c, 0, (tp + p) * 3 + 0] * px
                                + tcoef_ref[c, 0, (tp + p) * 3 + 1] * py
                                + tcoef_ref[c, 0, (tp + p) * 3 + 2]),
                            tcoef_ref[c, 0, (2 * tp + p) * 3 + 0] * px
                            + tcoef_ref[c, 0, (2 * tp + p) * 3 + 1] * py
                            + tcoef_ref[c, 0, (2 * tp + p) * 3 + 2])
                        acc = jnp.minimum(acc, jnp.where(
                            emin >= 0, tpk_ref[c, 0, p], sentinel))
                    best_ref[lo:hi, :] = acc

        if _ABLATE == 'nowarp':
            dmas[c].wait()
            bg2d = win_ref[c, :res, :res]
        else:
            tr = tmp_ref.at[c] if _PRIVSCRATCH else tmp_ref
            otr = out_tmp_ref.at[c] if _PRIVSCRATCH else out_tmp_ref
            bg2d = warp_view_packed(fcoef_ref, icoef_ref, c, win_ref.at[c],
                                    dmas[c], tmp_ref=tr,
                                    out_tmp_ref=otr)[:res, :res]
        if _ABLATE == 'nocomp':
            if packed_out:
                out_ref[c] = bg2d
            else:
                for ch in range(3):
                    out_ref[c, ch] = bg2d.astype(jnp.float32)
            continue
        best = best_ref[:, :]
        covered = best < (127 << 24)             # valid ranks <= 126
        if packed_out:
            prim = (((best >> 16) & 255) | (best & 0xFF00)
                    | ((best & 255) << 16))
            out_ref[c] = jnp.where(covered, prim, bg2d)
        else:
            r = jnp.where(covered, (best >> 16) & 255, bg2d & 255)
            g = jnp.where(covered, (best >> 8) & 255, (bg2d >> 8) & 255)
            b = jnp.where(covered, best & 255, (bg2d >> 16) & 255)
            out_ref[c, 0] = r.astype(jnp.float32) * inv255
            out_ref[c, 1] = g.astype(jnp.float32) * inv255
            out_ref[c, 2] = b.astype(jnp.float32) * inv255


def render_prims_fused_pallas(mip: Grid2D, cam_xy: jnp.ndarray,
                              cam_sc: jnp.ndarray, scale: float,
                              background_color: jnp.ndarray,
                              quads: jnp.ndarray, qz: jnp.ndarray,
                              qcolors: jnp.ndarray, tris: jnp.ndarray,
                              tz: jnp.ndarray, tcolors: jnp.ndarray,
                              qmask: jnp.ndarray, tmask: jnp.ndarray,
                              res: int = RES,
                              left_handed: bool = False,
                              packed_output: bool = False,
                              chunk: int = None) -> jnp.ndarray:
    """
    Hard z-priority rasterization of typed primitives directly over the
    warped baked background, in a single fused kernel.

    Semantically identical (bit-exact) to ``warp_background_pallas`` followed
    by ``rasterize_hard_pallas_prims_banded``; see those for argument
    contracts (prims row-major sorted with per-band chunk occupancy masks).

    Args:
        mip: packed int32 texture level (``mip.cell_size >= fov * MIP_FACTOR / 128``).
        cam_xy: (B, 2); cam_sc: (B, 2) (sin, cos); scale: 2 / fov.
        background_color: (3,) in [0, 1] for off-map pixels.
        quads / tris: (B, Q, 4, 2) / (B, T, 3, 2) SCREEN-space corners.
        qmask / tmask: (B, J, 1, ceil(Q/8)) / (B, J, 1, ceil(T/8)) int32.
        res: output resolution, <= 128 with a whole-vreg band tiling
            (``pallas_rasterize.supports_res``; any multiple of 16).
            Resolutions above 128 are served by the renderer's 2x2
            sub-camera tiling over this same kernel.
        packed_output: emit the image as (B, res, res) int32 0x00BBGGRR
            instead of 3 float channels -- identical 8-bit color content at
            a third of the HBM write traffic; decode on read with
            ``rendering.jax_renderer.unpack_rgb8_chw`` (XLA fuses the decode
            into the consumer, so the float image never materializes).
    Returns:
        (B, 3, res, res) float image in [0, 1], or (B, res, res) int32
        packed RGB8 when ``packed_output``.
    """
    assert res <= RES, "the 256-texel window only covers views up to 128 px"
    if chunk is None:
        chunk = _CHUNK
    b = cam_xy.shape[0]
    if _ABLATE == 'skip':
        # timing-only: measure the step with NO pallas_call at all. The
        # kernel inputs (sort, masks, prim gen) become dead and XLA DCEs
        # them, so this is the bare funcstep+metrics floor.
        if packed_output:
            return jnp.zeros((b, res, res), jnp.int32)
        return jnp.zeros((b, 3, res, res), jnp.float32)
    if _ABLATE == 'skipprep':
        # timing-only: no pallas_call, but CONSUME the prim prep (sort,
        # masks, coefficient build) so XLA cannot DCE it -- 'skipprep'
        # minus 'skip' is the prep cost; 'empty' minus 'skipprep' is pure
        # program-launch + zero-output-write cost
        fcoef, icoef = warp_coefficients(mip, cam_xy, cam_sc, scale,
                                         background_color, left_handed,
                                         res=res)
        qcoef, qpk, tcoef, tpk = _prep_prims(quads, qz, qcolors, tris, tz,
                                             tcolors)
        keep = (jnp.sum(fcoef) + jnp.sum(qcoef) + jnp.sum(tcoef)
                + (jnp.sum(qpk) + jnp.sum(tpk)).astype(jnp.float32)
                + (jnp.sum(qmask) + jnp.sum(tmask)).astype(jnp.float32))
        if packed_output:
            # int32 x*0 would be algebraically folded, DCE-ing the prep;
            # isnan(keep) cannot be folded (keep is data-dependent)
            return (jnp.zeros((b, res, res), jnp.int32)
                    + jnp.where(jnp.isnan(keep), 1, 0).astype(jnp.int32))
        return jnp.zeros((b, 3, res, res), jnp.float32) + keep * 0.0
    fcoef, icoef = warp_coefficients(mip, cam_xy, cam_sc, scale,
                                     background_color, left_handed, res=res)
    qcoef, qpk, tcoef, tpk = _prep_prims(quads, qz, qcolors, tris, tz,
                                         tcolors)
    return _render_coefs_fused(mip, fcoef, icoef, qcoef, qpk, tcoef, tpk,
                               qmask, tmask, res=res,
                               packed_output=packed_output, chunk=chunk)


def render_coefs_fused_pallas(mip: Grid2D, cam_xy: jnp.ndarray,
                              cam_sc: jnp.ndarray, scale: float,
                              background_color: jnp.ndarray,
                              qcoef: jnp.ndarray, qpk: jnp.ndarray,
                              tcoef: jnp.ndarray, tpk: jnp.ndarray,
                              qmask: jnp.ndarray, tmask: jnp.ndarray,
                              res: int = RES,
                              left_handed: bool = False,
                              packed_output: bool = False,
                              chunk: int = None) -> jnp.ndarray:
    """:func:`render_prims_fused_pallas` for PRE-BUILT kernel operands
    (``ops.rasterize.prep_sorted_prim_coefs``): same kernel, same output
    contract, but the caller supplies the packed coefficient tensors
    directly, skipping the corner-tensor round trip entirely."""
    assert res <= RES, "the 256-texel window only covers views up to 128 px"
    if chunk is None:
        chunk = _CHUNK
    if _ABLATE == 'skip':
        b = cam_xy.shape[0]
        if packed_output:
            return jnp.zeros((b, res, res), jnp.int32)
        return jnp.zeros((b, 3, res, res), jnp.float32)
    fcoef, icoef = warp_coefficients(mip, cam_xy, cam_sc, scale,
                                     background_color, left_handed, res=res)
    if _ABLATE == 'skipprep':
        b = cam_xy.shape[0]
        keep = (jnp.sum(fcoef) + jnp.sum(qcoef) + jnp.sum(tcoef)
                + (jnp.sum(qpk) + jnp.sum(tpk)).astype(jnp.float32)
                + (jnp.sum(qmask) + jnp.sum(tmask)).astype(jnp.float32))
        if packed_output:
            # see render_prims_fused_pallas: int32 x*0 folds, isnan doesn't
            return (jnp.zeros((b, res, res), jnp.int32)
                    + jnp.where(jnp.isnan(keep), 1, 0).astype(jnp.int32))
        return jnp.zeros((b, 3, res, res), jnp.float32) + keep * 0.0
    return _render_coefs_fused(mip, fcoef, icoef, qcoef, qpk, tcoef, tpk,
                               qmask, tmask, res=res,
                               packed_output=packed_output, chunk=chunk)


def _render_coefs_fused(mip, fcoef, icoef, qcoef, qpk, tcoef, tpk,
                        qmask, tmask, *, res, packed_output, chunk):
    b = fcoef.shape[0]
    n_bands = res // band_rows(res)
    assert qmask.shape[:2] == (b, n_bands), qmask.shape
    assert tmask.shape[:2] == (b, n_bands), tmask.shape
    if qpk.shape[1] % chunk or tpk.shape[1] % chunk:
        padp = lambda a, n: jnp.pad(
            a, ((0, 0),) * (a.ndim - 2) + ((0, n), (0, 0)))
        nq = -(-qpk.shape[1] // chunk) * chunk - qpk.shape[1]
        nt = -(-tpk.shape[1] // chunk) * chunk - tpk.shape[1]
        qcoef, qpk = padp(qcoef, nq), padp(qpk, nq)
        tcoef, tpk = padp(tcoef, nt), padp(tpk, nt)
        # padded prims have zero coefficients (edge value 0 passes the
        # quad |g| <= 0.5 / tri emin >= 0 tests) -- give them sentinel packs
        qpk = qpk.at[:, -nq:].set(np.int32(0x7FFFFFFF)) if nq else qpk
        tpk = tpk.at[:, -nt:].set(np.int32(0x7FFFFFFF)) if nt else tpk
    qp, tp = qpk.shape[1], tpk.shape[1]
    cq, ct = qp // chunk, tp // chunk
    qmask = jnp.pad(qmask, ((0, 0), (0, 0), (0, 0),
                            (0, cq - qmask.shape[3])))
    tmask = jnp.pad(tmask, ((0, 0), (0, 0), (0, 0),
                            (0, ct - tmask.shape[3])))

    cams = min(CAMS_PER_PROGRAM, b)
    b_pad = -(-b // cams) * cams
    if b_pad != b:
        pad = lambda a: jnp.concatenate(
            [a, jnp.repeat(a[-1:], b_pad - b, axis=0)], axis=0)
        fcoef, icoef, qmask, tmask, qcoef, qpk, tcoef, tpk = map(
            pad, (fcoef, icoef, qmask, tmask, qcoef, qpk, tcoef, tpk))

    cam_idx = lambda i: (i, 0, 0, 0)
    cam_idx3 = lambda i: (i, 0, 0)
    use_2d = res != RES or not _FORCE_FLAT
    # SMEM operands ride FLATTENED to (cams, 1, n) lane-aligned views:
    # Mosaic pads each trailing SMEM window dim to a whole tile, so e.g. a
    # (cams, J, 1, C) mask block costs J x 4 KB instead of J*C x 4 B --
    # the 4D layouts overflowed the 1 MB SMEM budget at res 112 (masks +
    # 2D-path prim coefficients; tools/certify_compile_matrix.py class)
    qmask = qmask.reshape(qmask.shape[0], 1, n_bands * cq)
    tmask = tmask.reshape(tmask.shape[0], 1, n_bands * ct)
    # the flat path reads prim coefficients as (chunk, PIXELS) vector
    # broadcasts (VMEM); the 2D path reads them as per-prim SMEM scalars,
    # flattened for the same reason
    prim_space = pltpu.SMEM if use_2d else pltpu.VMEM
    if use_2d:
        qcoef = qcoef.reshape(qcoef.shape[0], 1, 2 * qp * 3)
        tcoef = tcoef.reshape(tcoef.shape[0], 1, 3 * tp * 3)
        qpk = qpk.reshape(qpk.shape[0], 1, qp)
        tpk = tpk.reshape(tpk.shape[0], 1, tp)
    if packed_output:
        out_spec = pl.BlockSpec((cams, res, res), cam_idx3,
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((b_pad, res, res), jnp.int32)
    else:
        out_spec = pl.BlockSpec((cams, 3, res, res), cam_idx,
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((b_pad, 3, res, res), jnp.float32)
    out = pl.pallas_call(
        functools.partial(_fused_kernel, res=res, qp=qp, tp=tp, chunk=chunk,
                          n_bands=n_bands, cams=cams,
                          packed_out=packed_output, use_2d=use_2d),
        grid=(b_pad // cams,),
        in_specs=[
            pl.BlockSpec((cams, 1, 14), cam_idx3, memory_space=pltpu.SMEM),
            pl.BlockSpec((cams, 1, 4), cam_idx3, memory_space=pltpu.SMEM),
            pl.BlockSpec((cams, 1, n_bands * cq), cam_idx3,
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((cams, 1, n_bands * ct), cam_idx3,
                         memory_space=pltpu.SMEM),
        ] + ([
            pl.BlockSpec((cams, 1, 2 * qp * 3), cam_idx3,
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((cams, 1, qp), cam_idx3,
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((cams, 1, 3 * tp * 3), cam_idx3,
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((cams, 1, tp), cam_idx3,
                         memory_space=pltpu.SMEM),
        ] if use_2d else [
            pl.BlockSpec((cams, 2, qp, 3), cam_idx, memory_space=prim_space),
            pl.BlockSpec((cams, qp, 1), cam_idx3, memory_space=prim_space),
            pl.BlockSpec((cams, 3, tp, 3), cam_idx, memory_space=prim_space),
            pl.BlockSpec((cams, tp, 1), cam_idx3, memory_space=prim_space),
        ]) + [
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((cams, WIN_ROWS, WINDOW), jnp.int32),
            pltpu.SemaphoreType.DMA((cams,)),
            pltpu.VMEM((res, res), jnp.int32) if use_2d
            else pltpu.VMEM((n_bands, PIXELS_PER_TILE), jnp.int32),
            pltpu.VMEM((cams, WINDOW, RES) if _PRIVSCRATCH
                       else (WINDOW, RES), jnp.int32),
            pltpu.VMEM((cams, RES, RES) if _PRIVSCRATCH
                       else (RES, RES), jnp.int32),
        ],
    )(fcoef, icoef, qmask, tmask, qcoef, qpk, tcoef, tpk, mip.data[..., 0])
    if b_pad != b:
        out = out[:b]
    return out
