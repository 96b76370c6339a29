"""
Pallas TPU rasterization kernel.

All arithmetic stays on the VPU, tiled over flat pixel blocks:

* each face's three edge functions are affine in pixel coordinates and are
  evaluated for ALL faces over a whole pixel tile as (F, 1) x (1, pixels)
  broadcast FMAs;
* winner resolution packs priority-z (as order-preserving IEEE bit
  patterns) and RGB8 colors into int32s, so the per-pixel winner and its
  color are two masked min-reduces.

Two formulations were measured slower on v5e and rejected:

* MXU edge matmuls ((F, 3) @ (3, pixels) at f32): K=3 pads to 128 on the
  systolic array and float32 runs as multiple bf16 passes -- ~5x slower;
  the matmul shape, not FLOPs, sets the time.
* separable-edge tables over (F, rows, cols) 3D tiles (one broadcast add
  per edge): the (rows, 1) / (1, cols) operand layouts waste vector-register
  lanes and the broadcasts cost more than the FMAs saved -- ~2.5x slower.

Layout discipline (Mosaic rejects general shape casts): pixels are kept
FLAT -- the kernel reads background and writes output as (B, 3, H*W) and
every in-kernel array is (rows<=F, pixels); the (H, W) view is restored by
XLA outside. Winding is canonicalized outside the kernel (coefficients
scaled by sign(area)), so inside == all three edges non-negative. Ties
resolve to the lowest face index (z is made unique), matching the XLA path;
degenerate faces get sentinel z bits.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

BIG_Z = 1e9
#: pixels per kernel program; large tiles amortize per-program overhead
#: (VMEM use ~ 4 * F * PIXELS_PER_TILE bytes for the edge matrices).
#: Env-overridable for band-granularity sweeps: smaller tiles mean finer
#: bands (band_rows = tile/res), so the occupancy masks cull prim math to
#: fewer wasted pixels at the cost of more branch checks.
PIXELS_PER_TILE = int(os.environ.get('TDS_PIXELS_PER_TILE', '4096'))
#: faces per inner kernel iteration: bounds live VMEM intermediates to
#: (FACE_CHUNK, PIXELS_PER_TILE) so arbitrarily large face sets (e.g. a full
#: uncculled map mesh) fit; face counts <= FACE_CHUNK skip the loop entirely
FACE_CHUNK = 128
#: +inf bit pattern: larger than every finite positive float's bit pattern
_Z_SENTINEL = np.int32(0x7F800000)


def band_rows(res: int) -> int:
    """
    Rows per kernel band (= pixel tile) at resolution ``res``: the largest
    divisor of ``res`` whose flat band tile (``rows * res`` pixels) fits in
    :data:`PIXELS_PER_TILE` while staying a whole number of 128-lane vector
    registers (Mosaic requirement for the flat pixel layout).

    Every ``res % 16 == 0`` resolution has one (``rows = 16`` always
    qualifies); odd sizes like 40 or 120 do not -- gate with
    :func:`supports_res` and fall back to the XLA rasterizer.
    """
    best = 0
    for rpb in range(1, res + 1):
        if res % rpb or (rpb * res) % 128:
            continue
        if rpb * res > PIXELS_PER_TILE:
            break
        best = rpb
    if not best:
        raise ValueError(f"no whole-vreg band tiling for res={res}")
    return best


def supports_res(res: int) -> bool:
    """Whether the flat-band Pallas kernels can tile ``res`` directly."""
    try:
        band_rows(res)
        return True
    except ValueError:
        return False


def n_bands_for(res: int) -> int:
    """Kernel bands (pixel tiles / grid steps) per camera at ``res``."""
    return res // band_rows(res)


def _edge_coefficients_edge_major(corners: jnp.ndarray):
    """
    Edge-major affine coefficients: for edge k of every face,
    e_k(p) = a*px + b*py + c.

    Args:
        corners: (B, F, 3, 2) screen-space (row, col) corners.
    Returns:
        (coef (B, 3, F, 3) [edge, face, (a, b, c)], area (B, F)).
    """
    nxt = [1, 2, 0]
    a_pt = corners
    b_pt = corners[..., nxt, :]
    ex = b_pt[..., 0] - a_pt[..., 0]
    ey = b_pt[..., 1] - a_pt[..., 1]
    a = -ey
    b = ex
    c = ey * a_pt[..., 0] - ex * a_pt[..., 1]
    coef = jnp.stack([a, b, c], axis=-1)            # (B, F, 3edges, 3abc)
    coef = jnp.swapaxes(coef, 1, 2)                 # (B, 3edges, F, 3abc)
    area = (ex[..., 0] * (a_pt[..., 2, 1] - a_pt[..., 0, 1])
            - ey[..., 0] * (a_pt[..., 2, 0] - a_pt[..., 0, 0]))
    return coef, area


def _pixel_coords(res, tile=PIXELS_PER_TILE):
    # pixel-center coordinates (1, pixels) from the flat pixel index
    base = pl.program_id(1) * tile
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1) + base
    px = (idx // res).astype(jnp.float32) + 0.5
    py = (idx % res).astype(jnp.float32) + 0.5
    return px, py


def _unpack_rgb(wrgb):
    return jnp.concatenate([
        ((wrgb >> 16) & 255).astype(jnp.float32),
        ((wrgb >> 8) & 255).astype(jnp.float32),
        (wrgb & 255).astype(jnp.float32),
    ], axis=0) * (1.0 / 255.0)


def _raster_kernel_packed(coef_ref, packed_ref, bg_ref, out_ref, *, res,
                          tile):
    """Fast path for face counts <= 127: z-RANK (7 bits) and RGB8 share one
    int32, so the per-pixel winner AND its color fall out of a single masked
    min-reduce (rank ordering == z ordering by construction)."""
    px, py = _pixel_coords(res, tile)

    def edge(k):
        c = coef_ref[0, k]                               # (F, 3) [a, b, c]
        return c[:, 0:1] * px + c[:, 1:2] * py + c[:, 2:3]

    emin = jnp.minimum(jnp.minimum(edge(0), edge(1)), edge(2))
    pv = jnp.where(emin >= 0, packed_ref[0], np.int32(0x7FFFFFFF))
    best = jnp.min(pv, axis=0, keepdims=True)            # (1, pixels)
    covered = best < (127 << 24)                         # valid ranks <= 126
    out_ref[0] = jnp.where(covered, _unpack_rgb(best), bg_ref[0])


def _raster_kernel(coef_ref, zbits_ref, rgb_ref, bg_ref, out_ref, *, res,
                   n_chunks, tile):
    px, py = _pixel_coords(res, tile)

    def chunk_best(coef, zc, rc):
        """Per-pixel winner (z bits, packed rgb) among the given faces."""
        # edge functions as VPU broadcast FMAs: e_k = a*px + b*py + c, for all
        # chunk faces over the pixel tile as (size, 1) x (1, pixels) broadcasts
        def edge(k):
            c = coef[k]                                  # (size, 3) [a, b, c]
            return c[:, 0:1] * px + c[:, 1:2] * py + c[:, 2:3]

        emin = jnp.minimum(jnp.minimum(edge(0), edge(1)), edge(2))
        inside = emin >= 0                               # (size, pixels)

        # z priority as order-preserving int bits (positive floats compare
        # like their IEEE bit patterns): ONE masked min-reduce finds the winner
        zv = jnp.where(inside, zc, _Z_SENTINEL)
        best = jnp.min(zv, axis=0, keepdims=True)        # (1, pixels)

        # winner color: faces' z bits are unique, so equality selects exactly
        # the winning face; its RGB8 color falls out of a second min-reduce
        rgbv = jnp.where(zv == best, rc, jnp.int32(1 << 24))
        return best, jnp.min(rgbv, axis=0, keepdims=True)

    if n_chunks == 1:
        best, wrgb = chunk_best(coef_ref[0], zbits_ref[0], rgb_ref[0])
    else:
        # bound live intermediates to (FACE_CHUNK, pixels): fold face chunks
        # into a running per-pixel (best z, winner rgb)
        def body(c, carry):
            bz, br = carry
            start = pl.multiple_of(c * FACE_CHUNK, FACE_CHUNK)
            cz, cr = chunk_best(
                coef_ref[0, :, pl.ds(start, FACE_CHUNK), :],
                zbits_ref[0, pl.ds(start, FACE_CHUNK), :],
                rgb_ref[0, pl.ds(start, FACE_CHUNK), :])
            take = cz < bz
            return jnp.minimum(bz, cz), jnp.where(take, cr, br)

        init = (jnp.full((1, tile), _Z_SENTINEL, jnp.int32),
                jnp.full((1, tile), 1 << 24, jnp.int32))
        best, wrgb = jax.lax.fori_loop(0, n_chunks, body, init)

    covered = best < _Z_SENTINEL
    out_ref[0] = jnp.where(covered, _unpack_rgb(wrgb), bg_ref[0])


def rasterize_hard_pallas(corners: jnp.ndarray, z: jnp.ndarray,
                          colors: jnp.ndarray, res: int,
                          background: jnp.ndarray) -> jnp.ndarray:
    """
    Hard z-priority rasterization of per-camera face sets.

    Args:
        corners: (B, F, 3, 2) screen corners (row, col).
        z: (B, F) priority (lower on top); colors: (B, F, 3) in [0, 1]
            (carried as packed RGB8: quantization <= 1/510 per channel).
        background: (B, 3, H, W) channels-first background image.
    Returns:
        (B, 3, H, W) image in [0, 1].
    """
    b, f = z.shape
    n_pixels = res * res
    tile = band_rows(res) * res        # whole-row pixel tiles (<= 4096)
    # unique z per face: ties resolve to the lowest face index (the bump must
    # stay below the z-level spacing even for full-map face counts)
    z = z + jnp.arange(f, dtype=z.dtype)[None, :] * min(1e-4, 0.09 / max(f, 1))
    coef, area = _edge_coefficients_edge_major(corners)
    # canonicalize winding: inside == all three edge functions >= 0
    coef = coef * jnp.sign(area)[:, None, :, None]
    # shift z positive so its IEEE bit pattern is order-preserving as int32;
    # degenerate (masked) faces have all-zero edge functions, which would
    # read as "inside" everywhere -- send their z bits to the sentinel
    zpos = (z - jnp.min(z, axis=1, keepdims=True) + 1.0).astype(jnp.float32)
    zbits = jax.lax.bitcast_convert_type(zpos, jnp.int32)
    zbits = jnp.where(jnp.abs(area) > 1e-9, zbits, _Z_SENTINEL)[..., None]
    # colors as RGB8 packed in int32
    c8 = jnp.clip(jnp.round(colors * 255.0), 0, 255).astype(jnp.int32)
    rgb = ((c8[..., 0] << 16) | (c8[..., 1] << 8) | c8[..., 2])[..., None]
    bg_flat = background.reshape(b, 3, n_pixels)
    grid = (b, n_pixels // tile)

    if f <= 127:
        # fast path: z-rank (7 bits, same ordering as z) and RGB8 share one
        # int32, halving the kernel's winner-resolution work. Rank by pairwise
        # comparison count -- O(F^2) elementwise, no sort, no gather.
        rank = jnp.sum(zpos[:, None, :] < zpos[:, :, None], axis=-1,
                       dtype=jnp.int32)                      # (B, F)
        packed = (rank << 24) | rgb[..., 0]
        packed = jnp.where(jnp.abs(area) > 1e-9, packed,
                           np.int32(0x7FFFFFFF))[..., None]  # (B, F, 1)
        out = pl.pallas_call(
            functools.partial(_raster_kernel_packed, res=res, tile=tile),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 3, f, 3), lambda i, j: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, f, 1), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3, tile), lambda i, j: (i, 0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 3, tile),
                                   lambda i, j: (i, 0, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, 3, n_pixels), jnp.float32),
        )(coef, packed, bg_flat)
        return out.reshape(b, 3, res, res)

    # large face sets (e.g. a full uncculled map mesh) are folded in chunks
    # of FACE_CHUNK inside the kernel, bounding live VMEM intermediates
    if f > FACE_CHUNK:
        f_pad = -(-f // FACE_CHUNK) * FACE_CHUNK
        pad = f_pad - f
        coef = jnp.pad(coef, ((0, 0), (0, 0), (0, pad), (0, 0)))
        zbits = jnp.pad(zbits, ((0, 0), (0, pad), (0, 0)),
                        constant_values=_Z_SENTINEL)
        rgb = jnp.pad(rgb, ((0, 0), (0, pad), (0, 0)))
        n_chunks = f_pad // FACE_CHUNK
    else:
        f_pad, n_chunks = f, 1

    grid = (b, n_pixels // tile)
    out = pl.pallas_call(
        functools.partial(_raster_kernel, res=res, n_chunks=n_chunks,
                          tile=tile),
        grid=grid,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024) if n_chunks > 1 else None,
        in_specs=[
            pl.BlockSpec((1, 3, f_pad, 3), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f_pad, 1), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f_pad, 1), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, tile), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, tile), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 3, n_pixels), jnp.float32),
    )(coef, zbits, rgb, bg_flat)
    return out.reshape(b, 3, res, res)


# ---------------------------------------------------------------------------
# Typed-primitive kernel: quads (vehicle boxes, stoplines) + triangles
# ---------------------------------------------------------------------------

def _raster_kernel_prims(qcoef_ref, qpk_ref, tcoef_ref, tpk_ref, bg_ref,
                         out_ref, *, res, tile=PIXELS_PER_TILE):
    """Mixed quad + triangle rasterization, packed-winner resolution.

    A quad (any parallelogram: boxes stay parallelograms under the rigid
    camera transform) is tested with TWO affine strip coordinates in [0, 1]
    instead of the six edge functions of its two triangles -- half the
    per-pixel work for box-shaped content, which is most of a driving scene.
    """
    px, py = _pixel_coords(res, tile)
    sentinel = np.int32(0x7FFFFFFF)

    def affine(coef_ref, k):
        c = coef_ref[0, k]
        return c[:, 0:1] * px + c[:, 1:2] * py + c[:, 2:3]

    # quads: inside iff both (pre-centered) affine coordinates land in
    # [-1/2, 1/2] -- the 0.5 shift is folded into the constant coefficient
    g = jnp.maximum(jnp.abs(affine(qcoef_ref, 0)),
                    jnp.abs(affine(qcoef_ref, 1)))
    qv = jnp.where(g <= 0.5, qpk_ref[0], sentinel)
    best = jnp.min(qv, axis=0, keepdims=True)            # (1, pixels)

    # triangles: canonicalized winding, inside iff all edges >= 0
    emin = jnp.minimum(jnp.minimum(affine(tcoef_ref, 0), affine(tcoef_ref, 1)),
                       affine(tcoef_ref, 2))
    tv = jnp.where(emin >= 0, tpk_ref[0], sentinel)
    best = jnp.minimum(best, jnp.min(tv, axis=0, keepdims=True))

    covered = best < (127 << 24)                         # valid ranks <= 126
    out_ref[0] = jnp.where(covered, _unpack_rgb(best), bg_ref[0])


def _raster_kernel_prims_masked(qm_ref, tm_ref, qcoef_ref, qpk_ref,
                                tcoef_ref, tpk_ref, bg_ref, out_ref,
                                best_ref, *, res, qp, tp, chunk,
                                tile=PIXELS_PER_TILE):
    """:func:`_raster_kernel_prims` with per-(band, chunk) occupancy masks:
    prims come row-major sorted (visible first), and a chunk whose prims
    cannot touch this program's pixel band is skipped via ``@pl.when`` --
    per-pixel VPU work scales with the band's actual prim density, not the
    static budget. Masks are conservative bbox tests, so skipping is exact."""
    px, py = _pixel_coords(res, tile)
    sentinel = np.int32(0x7FFFFFFF)
    best_ref[:] = jnp.full((1, tile), sentinel, jnp.int32)

    def affine(c):
        return c[:, 0:1] * px + c[:, 1:2] * py + c[:, 2:3]

    for ci, s in enumerate(range(0, qp, chunk)):
        @pl.when(qm_ref[0, 0, 0, ci] != 0)
        def _(s=s):
            g = jnp.maximum(jnp.abs(affine(qcoef_ref[0, 0, s:s + chunk])),
                            jnp.abs(affine(qcoef_ref[0, 1, s:s + chunk])))
            qv = jnp.where(g <= 0.5, qpk_ref[0, s:s + chunk], sentinel)
            best_ref[:] = jnp.minimum(best_ref[:],
                                      jnp.min(qv, axis=0, keepdims=True))

    for ci, s in enumerate(range(0, tp, chunk)):
        @pl.when(tm_ref[0, 0, 0, ci] != 0)
        def _(s=s):
            emin = jnp.minimum(
                jnp.minimum(affine(tcoef_ref[0, 0, s:s + chunk]),
                            affine(tcoef_ref[0, 1, s:s + chunk])),
                affine(tcoef_ref[0, 2, s:s + chunk]))
            tv = jnp.where(emin >= 0, tpk_ref[0, s:s + chunk], sentinel)
            best_ref[:] = jnp.minimum(best_ref[:],
                                      jnp.min(tv, axis=0, keepdims=True))

    best = best_ref[:]
    covered = best < (127 << 24)                         # valid ranks <= 126
    out_ref[0] = jnp.where(covered, _unpack_rgb(best), bg_ref[0])


def _pad_prims(arrs, n, target, fill=0):
    if n == target:
        return arrs
    return [jnp.pad(a, ((0, 0), (0, target - n)) + ((0, 0),) * (a.ndim - 2),
                    constant_values=fill) for a in arrs]


def _prep_prims(quads, qz, qcolors, tris, tz, tcolors):
    """Per-camera kernel operands from typed primitives (any leading batch).

    Returns (qcoef (B, 2, QP, 3), qpk (B, QP, 1), tcoef (B, 3, TP, 3),
    tpk (B, TP, 1)) with both prim types padded to sublane multiples.
    """
    b, q = qz.shape
    t = tz.shape[1]
    n = q + t
    assert n <= 127, "prim path supports <= 127 primitives after culling"

    # joint z ordering -> 7-bit rank (ties resolve to quads, then index)
    z = jnp.concatenate([qz, tz], axis=1)
    z = z + jnp.arange(n, dtype=z.dtype)[None, :] * min(1e-4, 0.09 / max(n, 1))
    zpos = (z - jnp.min(z, axis=1, keepdims=True) + 1.0).astype(jnp.float32)
    rank = jnp.sum(zpos[:, None, :] < zpos[:, :, None], axis=-1,
                   dtype=jnp.int32)
    colors = jnp.concatenate([qcolors, tcolors], axis=1)
    c8 = jnp.clip(jnp.round(colors * 255.0), 0, 255).astype(jnp.int32)
    rgb = (c8[..., 0] << 16) | (c8[..., 1] << 8) | c8[..., 2]
    packed = (rank << 24) | rgb

    # quad affine coordinates (exact for any parallelogram): with sides
    # e1, e2 from c0, p = c0 + f1*e1 + f2*e2 and inside iff f1, f2 in [0, 1];
    # f1(p) = cross(p - c0, e2) / cross(e1, e2) is affine in p
    c0 = quads[:, :, 0]
    e1 = quads[:, :, 1] - c0
    e2 = quads[:, :, 3] - c0
    cross = e1[..., 0] * e2[..., 1] - e1[..., 1] * e2[..., 0]
    q_valid = jnp.abs(cross) > 1e-9
    d = jnp.where(q_valid, cross, 1.0)[..., None]

    def affine_coords(n):
        a = n / d                                        # (B, Q, 2)
        # -0.5: center the coordinate so the kernel tests |f| <= 1/2
        c = -jnp.sum(a * c0, axis=-1, keepdims=True) - 0.5
        return jnp.concatenate([a, c], axis=-1)          # (B, Q, 3)

    perp = lambda e: jnp.stack([e[..., 1], -e[..., 0]], axis=-1)
    qcoef = jnp.stack([affine_coords(perp(e2)),
                       affine_coords(-perp(e1))], axis=1)  # (B, 2, Q, 3)

    tcoef, area = _edge_coefficients_edge_major(tris)
    tcoef = tcoef * jnp.sign(area)[:, None, :, None]
    t_valid = jnp.abs(area) > 1e-9

    sentinel = np.int32(0x7FFFFFFF)
    qpk = jnp.where(q_valid, packed[:, :q], sentinel)[..., None]
    tpk = jnp.where(t_valid, packed[:, q:], sentinel)[..., None]

    # pad both prim types to sublane multiples (degenerate = sentinel packed,
    # all-zero coefficients read "inside" but never win)
    qp = max(8, -(-q // 8) * 8)
    tp = max(8, -(-t // 8) * 8)
    qcoef, = _pad_prims([jnp.swapaxes(qcoef, 1, 2)], q, qp)
    qcoef = jnp.swapaxes(qcoef, 1, 2)
    qpk, = _pad_prims([qpk], q, qp, fill=int(sentinel))
    tcoef, = _pad_prims([jnp.swapaxes(tcoef, 1, 2)], t, tp)
    tcoef = jnp.swapaxes(tcoef, 1, 2)
    tpk, = _pad_prims([tpk], t, tp, fill=int(sentinel))
    return qcoef, qpk, tcoef, tpk


def rasterize_hard_pallas_prims(quads: jnp.ndarray, qz: jnp.ndarray,
                                qcolors: jnp.ndarray, tris: jnp.ndarray,
                                tz: jnp.ndarray, tcolors: jnp.ndarray,
                                res: int, background: jnp.ndarray
                                ) -> jnp.ndarray:
    """
    Hard z-priority rasterization of typed primitives.

    Args:
        quads: (B, Q, 4, 2) screen corners in CYCLE order (c0, c1, c2, c3
            with c2 opposite c0); parallelograms (boxes under any rigid
            camera transform) are tested exactly.
        qz / tz: (B, Q) / (B, T) priorities (lower on top), shared scale.
        qcolors / tcolors: (..., 3) in [0, 1] (carried as packed RGB8).
        tris: (B, T, 3, 2) screen corners.
        background: (B, 3, H, W) channels-first.
    Returns:
        (B, 3, H, W) image in [0, 1].
    """
    b = qz.shape[0]
    n_pixels = res * res
    tile = band_rows(res) * res
    qcoef, qpk, tcoef, tpk = _prep_prims(quads, qz, qcolors, tris, tz, tcolors)
    qp, tp = qpk.shape[1], tpk.shape[1]

    bg_flat = background.reshape(b, 3, n_pixels)
    grid = (b, n_pixels // tile)
    out = pl.pallas_call(
        functools.partial(_raster_kernel_prims, res=res, tile=tile),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2, qp, 3), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qp, 1), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, tp, 3), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tp, 1), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, tile), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, tile), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 3, n_pixels), jnp.float32),
    )(qcoef, qpk, tcoef, tpk, bg_flat)
    return out.reshape(b, 3, res, res)


def rasterize_hard_pallas_prims_banded(quads: jnp.ndarray, qz: jnp.ndarray,
                                       qcolors: jnp.ndarray,
                                       tris: jnp.ndarray, tz: jnp.ndarray,
                                       tcolors: jnp.ndarray, res: int,
                                       background: jnp.ndarray,
                                       qmask: jnp.ndarray,
                                       tmask: jnp.ndarray) -> jnp.ndarray:
    """
    Banded variant of :func:`rasterize_hard_pallas_prims`: the kernel's pixel
    tile ``j`` covers image rows ``[j*bh, (j+1)*bh)`` with
    ``bh = band_rows(res)``, and per-(band, chunk) occupancy masks
    (:func:`~torchdrivesim_tpu.ops.rasterize.prim_band_chunk_masks` over
    row-major-sorted prims) let each tile skip whole 8-prim chunks that
    cannot touch it. One prim set per camera -- no per-band duplication, no
    compaction gathers -- so per-pixel VPU work scales with the band's
    ACTUAL prim density while correctness is exact (masks are conservative).

    Args:
        quads: (B, Q, 4, 2) screen corners in cycle order, row-major sorted
            (visible first; see ``sort_prims_rowmajor``); qz: (B, Q);
            qcolors: (B, Q, 3); tris: (B, T, 3, 2); tz / tcolors analogous.
        qmask / tmask: (B, J, 1, ceil(Q/8)) / (B, J, 1, ceil(T/8)) int32
            occupancy, J == n_bands_for(res) bands.
        background: (B, 3, H, W) channels-first.
    Returns:
        (B, 3, H, W) image in [0, 1].
    """
    b, q = qz.shape
    t = tz.shape[1]
    n_pixels = res * res
    tile = band_rows(res) * res
    n_bands = n_pixels // tile
    assert qmask.shape[:2] == (b, n_bands), qmask.shape
    assert tmask.shape[:2] == (b, n_bands), tmask.shape

    qcoef, qpk, tcoef, tpk = _prep_prims(quads, qz, qcolors, tris, tz,
                                         tcolors)
    qp, tp = qpk.shape[1], tpk.shape[1]
    # pad masks to the padded chunk counts (padded prims are dead)
    cq, ct = qp // 8, tp // 8
    qmask = jnp.pad(qmask, ((0, 0), (0, 0), (0, 0),
                            (0, cq - qmask.shape[3])))
    tmask = jnp.pad(tmask, ((0, 0), (0, 0), (0, 0),
                            (0, ct - tmask.shape[3])))

    bg_flat = background.reshape(b, 3, n_pixels)
    grid = (b, n_bands)
    cam_idx = lambda i, j: (i, 0, 0, 0)
    cam_idx3 = lambda i, j: (i, 0, 0)
    out = pl.pallas_call(
        functools.partial(_raster_kernel_prims_masked, res=res, qp=qp, tp=tp,
                          chunk=8, tile=tile),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, 1, cq), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1, ct), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2, qp, 3), cam_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qp, 1), cam_idx3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, tp, 3), cam_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tp, 1), cam_idx3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, tile), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, tile), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 3, n_pixels), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, tile), jnp.int32)],
    )(qmask, tmask, qcoef, qpk, tcoef, tpk, bg_flat)
    return out.reshape(b, 3, res, res)
