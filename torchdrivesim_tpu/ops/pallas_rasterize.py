"""
Pallas TPU rasterization kernel.

The XLA rasterizer (`ops/rasterize.py`) evaluates edge functions on the VPU
at ~25 elementwise ops per face-pixel and runs at VPU peak. This kernel
moves the arithmetic onto the MXU:

* each face's three edge functions are affine in pixel coordinates, so one
  (F x 3) @ (3 x pixels) matmul per edge index evaluates that edge for ALL
  faces over a whole pixel tile;
* the per-pixel winner is a min-reduce over faces (VPU);
* color selection is one more matmul: (3 x F) face colors @ (F x pixels)
  one-hot winner matrix.

Layout discipline (Mosaic rejects general shape casts): pixels are kept
FLAT -- the kernel reads background and writes output as (B, 3, H*W) and
every in-kernel array is (rows<=3F, 1024); the (H, W) view is restored by
XLA outside. Ties resolve to the lowest face index (z is made unique),
matching the XLA path; degenerate faces get z out of range.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG_Z = 1e9
#: pixels per kernel program; large tiles amortize per-program overhead
#: (VMEM use ~ 4 * F * PIXELS_PER_TILE bytes for the edge matrices)
PIXELS_PER_TILE = 4096


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


def _raster_kernel(coef_ref, z_ref, color_ref, bg_ref, out_ref, *, res):
    tile = pl.program_id(1)
    base = tile * PIXELS_PER_TILE

    # P matrix (3, pixels): rows (px, py, 1) from the flat pixel index
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, PIXELS_PER_TILE), 1) + base
    px = (idx // res).astype(jnp.float32) + 0.5
    py = (idx % res).astype(jnp.float32) + 0.5
    pmat = jnp.concatenate(
        [px, py, jnp.ones((1, PIXELS_PER_TILE), jnp.float32)], axis=0)

    # three edge evaluations, each one MXU pass: (F, 3) @ (3, pixels)
    hi = jax.lax.Precision.HIGHEST  # f32-accurate MXU passes: K=3 leaves the
    # MXU underutilized, so the extra passes are free, and bf16 edge math
    # would wobble edges by ~0.25 px
    e0 = jnp.dot(coef_ref[0, 0], pmat, preferred_element_type=jnp.float32,
                 precision=hi)
    e1 = jnp.dot(coef_ref[0, 1], pmat, preferred_element_type=jnp.float32,
                 precision=hi)
    e2 = jnp.dot(coef_ref[0, 2], pmat, preferred_element_type=jnp.float32,
                 precision=hi)
    emin = jnp.minimum(jnp.minimum(e0, e1), e2)
    emax = jnp.maximum(jnp.maximum(e0, e1), e2)
    inside = (emin >= 0) | (emax <= 0)               # (F, pixels)

    z = z_ref[0]                                     # (F, 1)
    zval = jnp.where(inside, z, BIG_Z)               # (F, pixels)
    best = jnp.min(zval, axis=0, keepdims=True)      # (1, pixels)
    covered = best < BIG_Z

    onehot = ((zval <= best) & inside).astype(jnp.float32)
    color = jnp.dot(color_ref[0], onehot, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)  # (3, pixels)

    out_ref[0] = jnp.where(covered, color, bg_ref[0])


def rasterize_hard_pallas(corners: jnp.ndarray, z: jnp.ndarray,
                          colors: jnp.ndarray, res: int,
                          background: jnp.ndarray) -> jnp.ndarray:
    """
    Hard z-priority rasterization of per-camera face sets.

    Args:
        corners: (B, F, 3, 2) screen corners (row, col).
        z: (B, F) priority (lower on top); colors: (B, F, 3) in [0, 1].
        background: (B, 3, H, W) channels-first background image.
    Returns:
        (B, 3, H, W) image in [0, 1].
    """
    b, f = z.shape
    n_pixels = res * res
    assert n_pixels % PIXELS_PER_TILE == 0
    # unique z per face: ties resolve to the lowest face index
    z = z + jnp.arange(f, dtype=z.dtype)[None, :] * 1e-4
    coef, area = _edge_coefficients_edge_major(corners)
    # degenerate (masked) faces have all-zero edge functions, which would
    # read as "inside" everywhere -- push their z out of range instead
    z = jnp.where(jnp.abs(area) > 1e-9, z, BIG_Z * 2)[..., None]  # (B, F, 1)
    colors_t = jnp.swapaxes(colors, 1, 2)                          # (B, 3, F)
    bg_flat = background.reshape(b, 3, n_pixels)

    grid = (b, n_pixels // PIXELS_PER_TILE)
    out = pl.pallas_call(
        functools.partial(_raster_kernel, res=res),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3, f, 3), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f, 1), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, f), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, PIXELS_PER_TILE), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, PIXELS_PER_TILE), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 3, n_pixels), jnp.float32),
    )(coef, z, colors_t, bg_flat)
    return out.reshape(b, 3, res, res)
