"""
TPU triangle rasterization for bird's-eye-view rendering.

Replaces the reference's three native rasterizer backends (pytorch3d CUDA,
nvdiffrast GL/CUDA, OpenCV CPU loops -- `torchdrivesim/rendering/`) with
XLA-native kernels designed around the structure of the workload:

* the scene is 2D with per-category priority z (lower z on top,
  `rendering/base.py:234-241`) and flat per-face colors;
* the static map mesh is large (tens of thousands of faces) but constant, so
  it is rasterized ONCE into a world-space texture and per-frame views are
  differentiable bilinear samples of it (gradients flow to the camera pose);
* dynamic content (agents, traffic lights, waypoints) is tens of faces per
  camera and is rasterized per frame:
  - ``rasterize_hard``: min-z reduction scanned over face chunks; every
    chunk is elementwise math + reduction that XLA fuses, memory stays at
    O(pixels);
  - ``rasterize_soft``: differentiable painter's blend over z-sorted faces
    with sigmoid edge coverage, for gradient flow to agent positions.

Screen convention matches the reference cv2 backend after its axis swap
(`rendering/cv2.py:53-67`): the camera's forward axis points UP in the
image, its left axis points LEFT; ``left_handed`` mirrors columns.
"""
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from torchdrivesim_tpu.ops.grids import Grid2D, bilinear_sample

BIG_Z = 1e9
DEGENERATE_AREA_EPS = 1e-9


def camera_rows_cols(points_xy: jnp.ndarray, cam_xy: jnp.ndarray,
                     cam_sc: jnp.ndarray, scale: float, res: int,
                     left_handed: bool = False) -> jnp.ndarray:
    """
    World points -> continuous pixel coordinates (row, col) for orthographic
    egocentric cameras.

    Args:
        points_xy: (B, N, 2) world points.
        cam_xy: (B, 2); cam_sc: (B, 2) as (sin psi, cos psi).
        scale: 2 / fov (meters -> clip units as in `rendering/base.py:149`).
        res: image resolution (square).
    Returns:
        (B, N, 2) float (row, col).
    """
    d = points_xy - cam_xy[:, None]
    s = cam_sc[:, None, 0]
    c = cam_sc[:, None, 1]
    forward = c * d[..., 0] + s * d[..., 1]   # along camera heading
    left = -s * d[..., 0] + c * d[..., 1]     # to the camera's left
    half = res / 2.0
    px_per_m = scale * half
    row = half - forward * px_per_m
    if left_handed:
        col = half + left * px_per_m
    else:
        col = half - left * px_per_m
    return jnp.stack([row, col], axis=-1)


def _face_arrays(verts: jnp.ndarray, faces: jnp.ndarray, attrs: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """
    Gather per-face screen corners, priority z, and flat color.

    Args:
        verts: (B, V, 3) screen-space (row, col, z).
        faces: (B, F, 3); attrs: (B, V, 3).
    Returns:
        (corners (B, F, 3, 2), z (B, F), color (B, F, 3)).
    """
    f = faces.astype(jnp.int32)
    tri = jnp.take_along_axis(verts[:, :, None, :], f[..., None], axis=1)  # B,F,3,3
    corners = tri[..., :2]
    z = tri[..., 0, 2]
    color = jnp.take_along_axis(attrs[:, :, None, :], f[..., :1, None], axis=1)[:, :, 0]
    return corners, z, color


def _edge_functions(corners: jnp.ndarray, px: jnp.ndarray, py: jnp.ndarray):
    """
    Signed edge functions of each face evaluated on the pixel grid.

    Args:
        corners: (B, F, 3, 2) screen corners (row, col).
        px, py: (H, W) pixel center coordinates (row, col).
    Returns:
        (e (B, F, 3, H, W), area (B, F)).
    """
    nxt = [1, 2, 0]
    a = corners
    b = corners[..., nxt, :]
    ex = b[..., 0] - a[..., 0]
    ey = b[..., 1] - a[..., 1]
    # e_k(p) = cross(b - a, p - a)
    e = (ex[..., None, None] * (py[None, None, None] - a[..., 1][..., None, None])
         - ey[..., None, None] * (px[None, None, None] - a[..., 0][..., None, None]))
    area = (ex[..., 0] * (a[..., 2, 1] - a[..., 0, 1])
            - ey[..., 0] * (a[..., 2, 0] - a[..., 0, 0]))
    return e, area


def _coverage_hard(corners: jnp.ndarray, px: jnp.ndarray, py: jnp.ndarray) -> jnp.ndarray:
    """Boolean coverage (B, F, H, W); degenerate faces cover nothing."""
    e, area = _edge_functions(corners, px, py)
    inside = jnp.all(e >= 0, axis=-3) | jnp.all(e <= 0, axis=-3)
    ok = (jnp.abs(area) > DEGENERATE_AREA_EPS)[..., None, None]
    return inside & ok


def cull_faces_to_view(corners: jnp.ndarray, z: jnp.ndarray, color: jnp.ndarray,
                       res: int, max_faces: int):
    """
    Keep only the ``max_faces`` faces closest to each camera's image center
    (screen space). With map-scale scenes most faces are far outside every
    camera's field of view; this turns per-pixel work from O(F_total) into
    O(max_faces). Degenerate (masked) faces sort last.

    Args:
        corners: (B, F, 3, 2) screen-space corners; z: (B, F); color: (B, F, 3).
    Returns:
        (corners (B, K, 3, 2), z (B, K), color (B, K, 3)) with K = max_faces.
    """
    f = corners.shape[1]
    if f <= max_faces:
        return corners, z, color
    center = jnp.mean(corners, axis=2)                      # (B, F, 2)
    d2 = jnp.sum((center - res / 2.0) ** 2, axis=-1)
    # out-of-view faces can never cover a pixel once their bbox misses the
    # image entirely; degenerate faces are pushed to the end
    nxt = [1, 2, 0]
    e = corners[..., nxt, :] - corners
    area = jnp.abs(e[..., 0, 0] * (corners[..., 2, 1] - corners[..., 0, 1])
                   - e[..., 0, 1] * (corners[..., 2, 0] - corners[..., 0, 0]))
    d2 = jnp.where(area > DEGENERATE_AREA_EPS, d2, jnp.inf)
    _, idx = jax.lax.top_k(-d2, max_faces)                  # (B, K)
    corners = jnp.take_along_axis(corners, idx[..., None, None], axis=1)
    z = jnp.take_along_axis(z, idx, axis=1)
    color = jnp.take_along_axis(color, idx[..., None], axis=1)
    return corners, z, color


def cull_prims_to_view(corners: jnp.ndarray, z: jnp.ndarray,
                       color: jnp.ndarray, res: int, keep: int):
    """
    :func:`cull_faces_to_view` for K-corner primitives (quads, triangles).

    Args:
        corners: (B, N, K, 2) screen-space corners; z: (B, N); color (B, N, 3).
    Returns:
        (corners (B, keep, K, 2), z, color).
    """
    n = corners.shape[1]
    if n <= keep:
        return corners, z, color
    center = jnp.mean(corners, axis=2)                      # (B, N, 2)
    d2 = jnp.sum((center - res / 2.0) ** 2, axis=-1)
    e1 = corners[:, :, 1] - corners[:, :, 0]
    e2 = corners[:, :, -1] - corners[:, :, 0]
    area = jnp.abs(e1[..., 0] * e2[..., 1] - e1[..., 1] * e2[..., 0])
    d2 = jnp.where(area > DEGENERATE_AREA_EPS, d2, jnp.inf)
    _, idx = jax.lax.top_k(-d2, keep)                       # (B, keep)
    corners = jnp.take_along_axis(corners, idx[..., None, None], axis=1)
    z = jnp.take_along_axis(z, idx, axis=1)
    color = jnp.take_along_axis(color, idx[..., None], axis=1)
    return corners, z, color


def _prim_screen_stats(corners: jnp.ndarray, res: int):
    """Per-prim screen bbox + liveness. corners: (B, N, K, 2) ->
    (rmin, rmax (B, N), alive (B, N)): alive == non-degenerate AND its bbox
    intersects the image."""
    rmin = jnp.min(corners[..., 0], axis=-1)
    rmax = jnp.max(corners[..., 0], axis=-1)
    cmin = jnp.min(corners[..., 1], axis=-1)
    cmax = jnp.max(corners[..., 1], axis=-1)
    e1 = corners[:, :, 1] - corners[:, :, 0]
    e2 = corners[:, :, -1] - corners[:, :, 0]
    area = jnp.abs(e1[..., 0] * e2[..., 1] - e1[..., 1] * e2[..., 0])
    alive = ((area > DEGENERATE_AREA_EPS)
             & (cmax >= 0.0) & (cmin < float(res))
             & (rmax >= 0.0) & (rmin < float(res)))
    return rmin, rmax, alive


def _sort_prim_arrays(key: jnp.ndarray, corners: jnp.ndarray, z: jnp.ndarray,
                      color: jnp.ndarray, extras: tuple = ()):
    """Reorder prims ascending by ``key`` along axis 1 with a multi-operand
    ``lax.sort`` -- a vectorized sorting network, NO gathers (XLA lowers
    ``take_along_axis`` to ~125M elem/s scalar loops on TPU; a per-band
    compaction built on it measured +2 ms/step at batch 256). ``extras``
    are additional (B, N) arrays carried through the same permutation."""
    b, n, k, _ = corners.shape
    comps = ([corners[:, :, i, j] for i in range(k) for j in range(2)]
             + [z] + [color[..., i] for i in range(3)] + list(extras))
    out = jax.lax.sort([key] + comps, dimension=1, num_keys=1)
    cs = out[1:1 + 2 * k]
    corners = jnp.stack([jnp.stack(cs[2 * i:2 * i + 2], axis=-1)
                         for i in range(k)], axis=2)
    z = out[1 + 2 * k]
    color = jnp.stack(out[2 + 2 * k:2 + 2 * k + 3], axis=-1)
    sorted_extras = tuple(out[5 + 2 * k:])
    return (corners, z, color) + ((sorted_extras,) if extras else ())


def sort_prims_rowmajor(corners: jnp.ndarray, z: jnp.ndarray,
                        color: jnp.ndarray, res: int, cap: int):
    """
    Order primitives for the banded Pallas kernel: visible prims FIRST,
    ascending by top screen row, then cap the count with a static slice.
    Row-major order makes visible prims spatially coherent in index space,
    so the kernel's per-band 8-prim chunk masks skip nearly all dead work.

    If more than ``cap`` prims are visible, the ones nearest the view center
    are kept (a preliminary distance sort, matching
    :func:`cull_prims_to_view` semantics).

    Args:
        corners: (B, N, K, 2) screen-space corners; z: (B, N); color (B, N, 3).
    Returns:
        (corners (B, <=cap, K, 2), z, color), invisible prims zeroed.
    """
    b, n = z.shape
    if n == 0:
        return corners, z, color
    big = jnp.float32(3e38)
    if n > cap:
        center = jnp.mean(corners, axis=2)
        d2 = jnp.sum((center - res / 2.0) ** 2, axis=-1)
        _, _, alive = _prim_screen_stats(corners, res)
        corners, z, color = _sort_prim_arrays(
            jnp.where(alive, d2, big), corners, z, color)
        corners, z, color = corners[:, :cap], z[:, :cap], color[:, :cap]
    rmin, _, alive = _prim_screen_stats(corners, res)
    corners, z, color = _sort_prim_arrays(
        jnp.where(alive, rmin, big), corners, z, color)
    # zero dropped/invisible prims so they are degenerate for the kernel
    keep_n = corners.shape[1]
    rank = jnp.arange(keep_n)[None, :]
    live = rank < jnp.sum(alive, axis=1, keepdims=True)
    corners = jnp.where(live[..., None, None], corners, 0.0)
    return corners, z, color


def sort_prims_rowmajor_with_masks(corners: jnp.ndarray, z: jnp.ndarray,
                                   color: jnp.ndarray, res: int, cap: int,
                                   n_bands: int, chunk: int = 8):
    """
    :func:`sort_prims_rowmajor` and :func:`prim_band_chunk_masks` in one
    pass: the per-prim screen stats (top/bottom row, liveness) ride through
    the multi-operand sort as extra operands, so the band-occupancy masks
    come straight from the sorted stats instead of being recomputed from
    the re-stacked sorted corner tensor (whose min/max-over-corners XLA
    lowers with layout shuffles -- measured ~0.3 ms/step at batch 256,
    ~5x the cost of the mask math itself).

    Returns:
        (corners (B, <=cap, K, 2), z, color, mask (B, n_bands, 1, n_chunks)).
    """
    b, n = z.shape
    n_chunks = max(1, -(-min(n, cap) // chunk))
    if n == 0:
        return (corners, z, color,
                jnp.zeros((b, n_bands, 1, n_chunks), jnp.int32))
    big = jnp.float32(3e38)
    rmin, rmax, alive = _prim_screen_stats(corners, res)
    if n > cap:
        center = jnp.mean(corners, axis=2)
        d2 = jnp.sum((center - res / 2.0) ** 2, axis=-1)
        corners, z, color, (rmin, rmax, alive_f) = _sort_prim_arrays(
            jnp.where(alive, d2, big), corners, z, color,
            extras=(rmin, rmax, alive.astype(jnp.float32)))
        corners, z, color = corners[:, :cap], z[:, :cap], color[:, :cap]
        rmin, rmax = rmin[:, :cap], rmax[:, :cap]
        alive = alive_f[:, :cap] > 0.5
    corners, z, color, (rmin, rmax, alive_f) = _sort_prim_arrays(
        jnp.where(alive, rmin, big), corners, z, color,
        extras=(rmin, rmax, alive.astype(jnp.float32)))
    alive = alive_f > 0.5
    keep_n = corners.shape[1]
    rank = jnp.arange(keep_n)[None, :]
    live = rank < jnp.sum(alive, axis=1, keepdims=True)
    corners = jnp.where(live[..., None, None], corners, 0.0)

    # EXACT per-(band, chunk) occupancy via an MXU block-diagonal reduction:
    # per-prim band hits (B, J, N) contract with a static (N, C) 0/1
    # prim-to-chunk matrix, so the chunk-OR is one tiny matmul with no
    # cross-lane relayout (the old reshape-(B,J,C,8)-any lowered with
    # ~0.27 ms of relayouts; a lane-shift hull tree cost ~0.1 ms and was
    # only a conservative superset -- straddling chunks got evaluated for
    # nothing; this form measured at noise level in tools/ablate_banded.py
    # 'm_matmul').
    band_h = res / n_bands
    bands_lo = jnp.arange(n_bands, dtype=rmin.dtype)[None, :, None] * band_h
    lo = jnp.where(alive, rmin, 1e9)[:, None, :]            # (B, 1, N)
    hi = jnp.where(alive, rmax, -1e9)[:, None, :]
    hits = (hi >= bands_lo) & (lo < bands_lo + band_h)      # (B, J, N)
    prim_to_chunk = (np.arange(keep_n)[:, None] // chunk
                     == np.arange(n_chunks)[None, :]).astype(np.float32)
    m = jnp.matmul(hits.astype(jnp.float32), jnp.asarray(prim_to_chunk))
    return corners, z, color, (m > 0).astype(jnp.int32)[:, :, None, :]


def _stable_rank(key: jnp.ndarray) -> jnp.ndarray:
    """Stable ascending rank: ``rank[b, i]`` is the position element ``i``
    takes when ``key[b]`` is sorted ascending with index tie-break --
    exactly the permutation a stable ``lax.sort`` applies. O(N^2) pairwise
    compares on the VPU; no sort, no gathers."""
    n = key.shape[1]
    idx = jnp.arange(n)
    lt = key[:, None, :] < key[:, :, None]          # [b, i, j]: key_j < key_i
    eq = key[:, None, :] == key[:, :, None]
    tie = (idx[None, :] < idx[:, None])[None]       # [i, j]: j < i
    return jnp.sum(lt | (eq & tie), axis=-1).astype(jnp.int32)


def _permute_rows(rank: jnp.ndarray, vals: jnp.ndarray) -> jnp.ndarray:
    """Apply the permutation ``rank`` (from :func:`_stable_rank`) to the
    rows of ``vals`` (B, N, M f32): ``out[b, r] = vals[b, i]`` where
    ``rank[b, i] == r`` -- as a one-hot batched matmul, which the MXU eats
    in a couple of microseconds. This replaces the 13+-operand ``lax.sort``
    whose stack/unstack re-assembly cost ~30 small layout-copy ops (~0.19
    ms/step at batch 256 -- each tiny (256, N) relayout pays the ~6 us
    small-op floor).

    Bit-exactness: a one-hot row selects exactly one payload, but the
    TPU's default f32 matmul rounds OPERANDS to bf16, and requesting
    ``Precision.HIGHEST`` instead sent XLA's compiler into pathological
    (>1 h) compile times once this dot sat inside a scan next to conv
    layers (the RL benchmark config). So the payload is permuted at the
    BIT level: bitcast to uint32, split into four bytes -- every value in
    [0, 255] is exact in bf16 -- permute all byte planes with ONE
    default-precision dot, and reassemble. Exact for any 32-bit payload,
    f32 or int32 bits alike."""
    b, n = rank.shape
    m = vals.shape[-1]
    onehot = (rank[:, None, :] == jnp.arange(n)[None, :, None]
              ).astype(jnp.float32)                 # (B, r, i)
    u = jax.lax.bitcast_convert_type(vals.astype(jnp.float32), jnp.uint32)
    byts = jnp.stack([(u >> (8 * k)) & 0xFF for k in range(4)],
                     axis=-1)                       # (B, N, M, 4)
    planes = byts.astype(jnp.float32).reshape(b, n, m * 4)
    out = jax.lax.dot_general(
        onehot, planes, (((2,), (1,)), ((0,), (0,))))
    ob = out.astype(jnp.uint32).reshape(b, n, m, 4)
    res = (ob[..., 0] | (ob[..., 1] << 8) | (ob[..., 2] << 16)
           | (ob[..., 3] << 24))
    return jax.lax.bitcast_convert_type(res, jnp.float32)


def prep_sorted_prim_coefs(quads: jnp.ndarray, qz: jnp.ndarray,
                           qcolors: jnp.ndarray, tris: jnp.ndarray,
                           tz: jnp.ndarray, tcolors: jnp.ndarray,
                           res: int, cap: int, n_bands: int,
                           chunk: int = 8):
    """
    Row-major-sorted fused-kernel operands WITHOUT the multi-operand sort:
    per-prim coefficient math commutes with reordering, so the packed
    coefficients are computed on the unsorted prims and reordered with a
    one-hot permutation matmul (:func:`_permute_rows`); the band-chunk
    occupancy masks contract unsorted band hits against a rank-derived
    chunk one-hot, so nothing else needs permuting.

    Pixel-identical to ``sort_prims_rowmajor_with_masks`` followed by the
    fused kernel's ``_prep_prims`` (the z-rank tie-break epsilon is applied
    at each prim's SORTED position, reproducing the sorted path's packed
    values bit-for-bit), but with none of that path's stack/unstack layout
    copies.

    Returns:
        (qcoef (B, 2, QP, 3), qpk (B, QP, 1), qmask (B, J, 1, QP/chunk),
         tcoef (B, 3, TP, 3), tpk (B, TP, 1), tmask (B, J, 1, TP/chunk)),
        or ``None`` when a prim type exceeds ``cap`` (caller falls back to
        the trimming sort path).
    """
    b, q = qz.shape
    t = tz.shape[1]
    n = q + t
    if q > cap or t > cap or n > 127:
        return None
    sentinel = np.int32(0x7FFFFFFF)
    big = jnp.float32(3e38)
    band_h = res / n_bands
    bands_lo = jnp.arange(n_bands, dtype=jnp.float32)[None, :, None] * band_h

    def masks_of(rank, rmin, rmax, alive, n_chunks):
        lo = jnp.where(alive, rmin, 1e9)[:, None, :]         # (B, 1, N)
        hi = jnp.where(alive, rmax, -1e9)[:, None, :]
        hits = ((hi >= bands_lo) & (lo < bands_lo + band_h)
                ).astype(jnp.float32)                        # (B, J, N)
        conehot = ((rank // chunk)[:, :, None]
                   == jnp.arange(n_chunks)[None, None, :]
                   ).astype(jnp.float32)                     # (B, N, C)
        # default precision is exact here: 0/1 operands are bf16-exact and
        # the MXU accumulates in f32
        m = jax.lax.dot_general(
            hits, conehot, (((2,), (1,)), ((0,), (0,))))
        return (m > 0).astype(jnp.int32)[:, :, None, :]

    # row-major ranks per type (dead prims last, as the sort's key does)
    if q:
        q_rmin, q_rmax, q_alive = _prim_screen_stats(quads, res)
        q_rank = _stable_rank(jnp.where(q_alive, q_rmin, big))
    if t:
        t_rmin, t_rmax, t_alive = _prim_screen_stats(tris, res)
        t_rank = _stable_rank(jnp.where(t_alive, t_rmin, big))

    # joint z -> 7-bit rank, with the tie-break epsilon indexed by each
    # prim's SORTED position so the packed values match the sorted path
    # exactly (`_prep_prims` applies arange(n) AFTER sorting)
    pos = jnp.concatenate(
        ([q_rank] if q else []) + ([q + t_rank] if t else []),
        axis=1).astype(qz.dtype)
    z = jnp.concatenate([qz, tz], axis=1)
    z = z + pos * min(1e-4, 0.09 / max(n, 1))
    zpos = (z - jnp.min(z, axis=1, keepdims=True) + 1.0).astype(jnp.float32)
    zrank = jnp.sum(zpos[:, None, :] < zpos[:, :, None], axis=-1,
                    dtype=jnp.int32)
    colors = jnp.concatenate([qcolors, tcolors], axis=1)
    c8 = jnp.clip(jnp.round(colors * 255.0), 0, 255).astype(jnp.int32)
    rgb = (c8[..., 0] << 16) | (c8[..., 1] << 8) | c8[..., 2]
    packed = (zrank << 24) | rgb

    def hi_lo(pk):
        # split the 31-bit pack into two < 2^16 halves (exact in f32)
        return ((pk >> 16).astype(jnp.float32),
                (pk & 0xFFFF).astype(jnp.float32))

    from torchdrivesim_tpu.ops.pallas_rasterize import (
        _edge_coefficients_edge_major, _pad_prims)

    if q:
        # quad affine coordinates, identical math to `_prep_prims`
        c0 = quads[:, :, 0]
        e1 = quads[:, :, 1] - c0
        e2 = quads[:, :, 3] - c0
        cross = e1[..., 0] * e2[..., 1] - e1[..., 1] * e2[..., 0]
        q_valid = jnp.abs(cross) > 1e-9
        d = jnp.where(q_valid, cross, 1.0)[..., None]

        def affine_coords(nrm):
            a = nrm / d
            c = -jnp.sum(a * c0, axis=-1, keepdims=True) - 0.5
            return jnp.concatenate([a, c], axis=-1)          # (B, Q, 3)

        perp = lambda e: jnp.stack([e[..., 1], -e[..., 0]], axis=-1)
        qpk_u = jnp.where(q_valid & q_alive, packed[:, :q], sentinel)
        qhi, qlo = hi_lo(qpk_u)
        qvals = jnp.concatenate(
            [affine_coords(perp(e2)), affine_coords(-perp(e1)),
             qhi[..., None], qlo[..., None]], axis=-1)       # (B, Q, 8)
        qs = _permute_rows(q_rank, qvals)
        qcoef = jnp.swapaxes(qs[..., :6].reshape(b, q, 2, 3), 1, 2)
        qpk = ((qs[..., 6].astype(jnp.int32) << 16)
               | qs[..., 7].astype(jnp.int32))[..., None]
        qp = max(8, -(-q // 8) * 8)
        qcoef, = _pad_prims([jnp.swapaxes(qcoef, 1, 2)], q, qp)
        qcoef = jnp.swapaxes(qcoef, 1, 2)
        qpk, = _pad_prims([qpk], q, qp, fill=int(sentinel))
        qmask = masks_of(q_rank, q_rmin, q_rmax, q_alive,
                         max(1, -(-qp // chunk)))
    else:
        qp = 8
        qcoef = jnp.zeros((b, 2, qp, 3), jnp.float32)
        qpk = jnp.full((b, qp, 1), sentinel, jnp.int32)
        qmask = jnp.zeros((b, n_bands, 1, max(1, -(-qp // chunk))),
                          jnp.int32)

    if t:
        tcoef_u, area = _edge_coefficients_edge_major(tris)
        tcoef_u = tcoef_u * jnp.sign(area)[:, None, :, None]
        t_valid = jnp.abs(area) > 1e-9
        tpk_u = jnp.where(t_valid & t_alive, packed[:, q:], sentinel)
        thi, tlo = hi_lo(tpk_u)
        tvals = jnp.concatenate(
            [jnp.moveaxis(tcoef_u, 1, 2).reshape(b, t, 9),
             thi[..., None], tlo[..., None]], axis=-1)       # (B, T, 11)
        ts = _permute_rows(t_rank, tvals)
        tcoef = jnp.moveaxis(ts[..., :9].reshape(b, t, 3, 3), 2, 1)
        tpk = ((ts[..., 9].astype(jnp.int32) << 16)
               | ts[..., 10].astype(jnp.int32))[..., None]
        tp = max(8, -(-t // 8) * 8)
        tcoef, = _pad_prims([jnp.swapaxes(tcoef, 1, 2)], t, tp)
        tcoef = jnp.swapaxes(tcoef, 1, 2)
        tpk, = _pad_prims([tpk], t, tp, fill=int(sentinel))
        tmask = masks_of(t_rank, t_rmin, t_rmax, t_alive,
                         max(1, -(-tp // chunk)))
    else:
        tp = 8
        tcoef = jnp.zeros((b, 3, tp, 3), jnp.float32)
        tpk = jnp.full((b, tp, 1), sentinel, jnp.int32)
        tmask = jnp.zeros((b, n_bands, 1, max(1, -(-tp // chunk))),
                          jnp.int32)

    return qcoef, qpk, qmask, tcoef, tpk, tmask


def prim_band_chunk_masks(corners: jnp.ndarray, res: int, n_bands: int,
                          chunk: int = 8) -> jnp.ndarray:
    """
    Per-(band, chunk) occupancy for the banded kernel: entry ``[b, j, 0, c]``
    is 1 iff any prim in chunk ``c`` (prims ``c*chunk..(c+1)*chunk-1``) is
    alive and its row interval intersects band ``j`` (image rows
    ``[j*res/n_bands, (j+1)*res/n_bands)``).

    Args:
        corners: (B, N, K, 2) screen-space corners (row-major sorted for the
            masks to be effective; see :func:`sort_prims_rowmajor`).
    Returns:
        (B, n_bands, 1, n_chunks) int32, n_chunks = ceil(N / chunk).
    """
    b, n = corners.shape[:2]
    n_chunks = max(1, -(-n // chunk))
    if n == 0:
        return jnp.zeros((b, n_bands, 1, n_chunks), jnp.int32)
    band_h = res / n_bands
    rmin, rmax, alive = _prim_screen_stats(corners, res)
    lo = jnp.arange(n_bands, dtype=jnp.float32) * band_h    # (J,)
    hit = (alive[:, None, :]
           & (rmax[:, None, :] >= lo[None, :, None])
           & (rmin[:, None, :] < (lo + band_h)[None, :, None]))  # (B, J, N)
    pad = n_chunks * chunk - n
    if pad:
        hit = jnp.pad(hit, ((0, 0), (0, 0), (0, pad)))
    mask = jnp.any(hit.reshape(b, n_bands, n_chunks, chunk), axis=-1)
    return mask.astype(jnp.int32)[:, :, None, :]


def rasterize_hard(verts: jnp.ndarray, faces: jnp.ndarray, attrs: jnp.ndarray,
                   res: int, background: jnp.ndarray,
                   face_chunk: int = 16, cull_to: int = 0) -> jnp.ndarray:
    """
    Hard z-priority rasterization.

    The per-pixel winner is resolved with an unrolled chain of vectorized
    ``where`` updates over faces inside each chunk -- no per-pixel gathers
    (an earlier ``argmin`` + ``take_along_axis`` formulation was ~10x slower
    on TPU because XLA lowers those to scalar gather loops).

    Args:
        verts: (B, V, 3) screen-space vertices (row, col, priority z).
        faces: (B, F, 3) triangle indices (masked faces may be all-zero).
        attrs: (B, V, 3) vertex colors in [0, 1] (flat per face).
        res: output resolution (square).
        background: (B, H, W, 3) image composited under all faces.
    Returns:
        (B, H, W, 3) image in [0, 1].
    """
    b = verts.shape[0]
    f_total = faces.shape[1]
    if f_total == 0:
        return background
    corners, z, color = _face_arrays(verts, faces, attrs)
    if cull_to:
        corners, z, color = cull_faces_to_view(corners, z, color, res, cull_to)
    return rasterize_hard_faces(corners, z, color, res, background,
                                face_chunk=face_chunk)


def rasterize_hard_faces(corners: jnp.ndarray, z: jnp.ndarray,
                         color: jnp.ndarray, res: int, background: jnp.ndarray,
                         face_chunk: int = 16) -> jnp.ndarray:
    """
    Hard rasterization from per-face arrays (corners (B, F, 3, 2) in screen
    space, z (B, F), color (B, F, 3)); see :func:`rasterize_hard`.
    """
    b = corners.shape[0]
    pad = (-corners.shape[1]) % face_chunk
    if pad:
        corners = jnp.concatenate(
            [corners, jnp.zeros((b, pad, 3, 2), corners.dtype)], axis=1)
        z = jnp.concatenate([z, jnp.full((b, pad), BIG_Z, z.dtype)], axis=1)
        color = jnp.concatenate([color, jnp.zeros((b, pad, 3), color.dtype)], axis=1)
    n_chunks = corners.shape[1] // face_chunk
    corners = jnp.moveaxis(
        corners.reshape(b, n_chunks, face_chunk, 3, 2), 1, 0)
    z = jnp.moveaxis(z.reshape(b, n_chunks, face_chunk), 1, 0)
    color = jnp.moveaxis(color.reshape(b, n_chunks, face_chunk, 3), 1, 0)

    coords = jnp.arange(res, dtype=corners.dtype) + 0.5
    px = jnp.broadcast_to(coords[:, None], (res, res))  # row coordinate
    py = jnp.broadcast_to(coords[None, :], (res, res))  # col coordinate

    def body(carry, chunk):
        best_z, best_color = carry
        cc, cz, ccol = chunk
        cover = _coverage_hard(cc, px, py)                       # B,Fc,H,W
        for f in range(face_chunk):
            zval = jnp.where(cover[:, f], cz[:, f, None, None], BIG_Z)
            better = zval < best_z
            best_z = jnp.where(better, zval, best_z)
            best_color = jnp.where(better[..., None],
                                   ccol[:, f, None, None, :], best_color)
        return (best_z, best_color), None

    init = (jnp.full((b, res, res), BIG_Z, corners.dtype), background)
    (best_z, best_color), _ = jax.lax.scan(body, init, (corners, z, color))
    return best_color


def rasterize_softmax(verts: jnp.ndarray, faces: jnp.ndarray, attrs: jnp.ndarray,
                      res: int, background: jnp.ndarray, sigma: float = 0.5,
                      gamma: float = 0.5, face_chunk: int = 16) -> jnp.ndarray:
    """
    Order-independent differentiable rasterization in the spirit of
    pytorch3d's softmax blend (`rendering/pytorch3d.py:27-44` soft mode),
    with one deliberate divergence (documented in docs/design.md): COVERAGE
    and Z-ARBITRATION are decoupled. Per pixel,

    * ``alpha_f = prod_edges sigmoid(d/sigma) * ramp(window)`` is the face's
      soft coverage in [0, 1];
    * overlapping faces resolve by softmax over ``alpha_f * exp(-z_f/gamma)``
      (lower z wins as gamma -> 0), giving ``c_faces``;
    * total coverage ``A = 1 - prod_f (1 - alpha_f)`` (order-independent)
      lerps against the background: ``A * c_faces + (1 - A) * bg``.

    pytorch3d instead normalizes the z-amplified weights together with a
    background delta, which makes the amplified sigmoid tail opaque against
    the background -- the image then JUMPS by a full face color at the blur
    window's support edge (a known gradient pathology). The decoupled form
    is continuous everywhere at the sigma scale and passes full-vector
    central-difference gradchecks (tests/test_rasterize.py).

    Unlike :func:`rasterize_soft` (a sequential painter's scan over faces),
    the reduction is a chunked accumulator, so it parallelizes like the
    hard path -- use this for training through rendering at scale.

    Args:
        sigma: edge softness in pixels; gamma: z-priority temperature
            (smaller = harder priority).
    Returns:
        (B, H, W, 3) image in [0, 1].
    """
    b = verts.shape[0]
    if faces.shape[1] == 0:
        return background
    corners, z, color = _face_arrays(verts, faces, attrs)
    # z weights relative to a virtual plane at z=20 keep everything in a
    # float32-friendly range (z levels are 2..15); they only ever arbitrate
    # BETWEEN faces (never against the background), so the huge ratios are
    # harmless
    z_bg = 20.0
    zw = jnp.exp((z_bg - z) / gamma)
    pad = (-corners.shape[1]) % face_chunk
    if pad:
        corners = jnp.concatenate(
            [corners, jnp.zeros((b, pad, 3, 2), corners.dtype)], axis=1)
        zw = jnp.concatenate([zw, jnp.zeros((b, pad), zw.dtype)], axis=1)
        color = jnp.concatenate([color, jnp.zeros((b, pad, 3), color.dtype)],
                                axis=1)
    n_chunks = corners.shape[1] // face_chunk
    corners = jnp.moveaxis(corners.reshape(b, n_chunks, face_chunk, 3, 2), 1, 0)
    zw = jnp.moveaxis(zw.reshape(b, n_chunks, face_chunk), 1, 0)
    color = jnp.moveaxis(color.reshape(b, n_chunks, face_chunk, 3), 1, 0)

    coords = jnp.arange(res, dtype=verts.dtype) + 0.5
    px = jnp.broadcast_to(coords[:, None], (res, res))
    py = jnp.broadcast_to(coords[None, :], (res, res))
    nxt = [1, 2, 0]

    def body(carry, chunk):
        num, den, transparent = carry
        cc, czw, ccol = chunk
        e, area = _edge_functions(cc, px, py)             # B,Fc,3,H,W
        sign = jnp.sign(area)[..., None, None, None]
        ed = cc[..., nxt, :] - cc
        # clamped sqrt: norm'(0) = inf would turn masked degenerate faces'
        # zero gradient into 0 * inf = NaN and poison the whole batch
        elen = jnp.sqrt(jnp.maximum(jnp.sum(ed * ed, -1), 1e-12))  # B,Fc,3
        d = e * sign / (elen[..., None, None] + 1e-8)
        alpha = jnp.prod(jax.nn.sigmoid(d / sigma), axis=2)  # B,Fc,H,W
        # C0 support window over [-4 sigma, -3 sigma]: coverage is O(1), so
        # the ramp's transition is genuinely gradual (no z amplification)
        dmin = jnp.min(d, axis=2)
        window = jnp.clip(dmin / sigma + 4.0, 0.0, 1.0)
        ok = (jnp.abs(area) > DEGENERATE_AREA_EPS)[..., None, None]
        alpha = jnp.where(ok, alpha * window, 0.0)
        w = alpha * czw[..., None, None]
        num = num + jnp.einsum('bfhw,bfc->bhwc', w, ccol)
        den = den + jnp.sum(w, axis=1)
        transparent = transparent * jnp.prod(1.0 - alpha, axis=1)
        return (num, den, transparent), None

    init = (jnp.zeros_like(background),
            jnp.zeros((b, res, res), verts.dtype),
            jnp.ones((b, res, res), verts.dtype))
    (num, den, transparent), _ = jax.lax.scan(body, init, (corners, zw, color))
    # maximum (not +eps): with den == 0 the branch is a constant, so the
    # backward pass never forms num/den^2 with an underflowing denominator
    c_faces = num / jnp.maximum(den[..., None], 1e-8)
    coverage = (1.0 - transparent)[..., None]
    return coverage * c_faces + (1.0 - coverage) * background


def rasterize_soft(verts: jnp.ndarray, faces: jnp.ndarray, attrs: jnp.ndarray,
                   res: int, background: jnp.ndarray, sigma: float = 0.5
                   ) -> jnp.ndarray:
    """
    Differentiable painter's-algorithm rasterization: faces are blended
    back-to-front (descending z) with sigmoid edge coverage, so gradients
    flow from pixels to vertex positions. Plays the role of pytorch3d's
    soft/sigmoid blending (`rendering/pytorch3d.py:27-44`).

    Args:
        sigma: edge softness in pixels.
    Returns:
        (B, H, W, 3) image in [0, 1].
    """
    b = verts.shape[0]
    if faces.shape[1] == 0:
        return background
    corners, z, color = _face_arrays(verts, faces, attrs)
    # back-to-front: sort by descending z (stop_gradient on ordering)
    order = jnp.argsort(-jax.lax.stop_gradient(z), axis=1)
    corners = jnp.take_along_axis(corners, order[..., None, None], axis=1)
    color = jnp.take_along_axis(color, order[..., None], axis=1)
    z = jnp.take_along_axis(z, order, axis=1)

    coords = jnp.arange(res, dtype=verts.dtype) + 0.5
    px = jnp.broadcast_to(coords[:, None], (res, res))
    py = jnp.broadcast_to(coords[None, :], (res, res))

    corners_s = jnp.moveaxis(corners, 1, 0)  # F,B,3,2
    color_s = jnp.moveaxis(color, 1, 0)

    def body(canvas, face):
        cc, ccol = face                                  # B,3,2 / B,3
        e, area = _edge_functions(cc[:, None], px, py)   # B,1,3,H,W
        e = e[:, 0]
        area = area[:, 0]
        sign = jnp.sign(area)[..., None, None, None]
        # normalize edge functions to pixel distances
        nxt = [1, 2, 0]
        ed = cc[:, nxt] - cc
        elen = jnp.sqrt(jnp.maximum(jnp.sum(ed * ed, -1), 1e-12))  # B,3
        d = e * sign / (elen[..., None, None] + 1e-8)
        w = jnp.prod(jax.nn.sigmoid(d / sigma), axis=1)   # B,H,W
        ok = (jnp.abs(area) > DEGENERATE_AREA_EPS)[:, None, None]
        w = jnp.where(ok, w, 0.0)
        canvas = canvas * (1 - w[..., None]) + ccol[:, None, None, :] * w[..., None]
        return canvas, None

    canvas, _ = jax.lax.scan(body, background, (corners_s, color_s))
    return canvas


# ----------------------------------------------------------------------------
# Static background: world-space baking + per-camera sampling
# ----------------------------------------------------------------------------

def bake_background_texture(verts: jnp.ndarray, faces: jnp.ndarray,
                            attrs: jnp.ndarray, background_color: jnp.ndarray,
                            pixels_per_meter: float = 4.0,
                            margin: float = 20.0,
                            face_chunk: int = 32,
                            row_chunk: int = 512) -> Grid2D:
    """
    Rasterize a static mesh once into a world-anchored RGB texture.

    Args:
        verts: (V, 3) world (x, y, priority z); faces: (F, 3); attrs: (V, 3).
        background_color: (3,) color outside all faces.
    Returns:
        Grid2D whose data[iy, ix] covers world point origin + (ix, iy)/ppm.
    """
    v = np.asarray(verts)
    lo = v[:, :2].min(axis=0) - margin
    hi = v[:, :2].max(axis=0) + margin
    w = int(np.ceil((hi[0] - lo[0]) * pixels_per_meter)) + 1
    h = int(np.ceil((hi[1] - lo[1]) * pixels_per_meter)) + 1
    cell = 1.0 / pixels_per_meter

    # screen space = texture space: row ~ y, col ~ x
    sv = jnp.stack([
        (verts[:, 1] - lo[1]) * pixels_per_meter,
        (verts[:, 0] - lo[0]) * pixels_per_meter,
        verts[:, 2],
    ], axis=-1)[None]

    bg_row = jnp.broadcast_to(jnp.asarray(background_color, jnp.float32),
                              (1, w, 3))

    # rasterize in horizontal strips to bound memory
    rows = []
    render = jax.jit(_bake_strip, static_argnames=('h0', 'strip_h', 'w', 'face_chunk'))
    for r0 in range(0, h, row_chunk):
        strip_h = min(row_chunk, h - r0)
        strip = render(sv, faces[None], attrs[None],
                       jnp.broadcast_to(bg_row[:, None], (1, strip_h, w, 3)),
                       h0=r0, strip_h=strip_h, w=w, face_chunk=face_chunk)
        rows.append(np.asarray(strip[0]))
    data = np.concatenate(rows, axis=0)
    return Grid2D(data=jnp.asarray(data),
                  origin=jnp.asarray(lo, dtype=jnp.float32), cell_size=cell)


def _bake_strip(sv, faces, attrs, background, *, h0, strip_h, w, face_chunk):
    # shift rows so the strip starts at row 0
    sv = sv.at[..., 0].add(-h0)
    return _rasterize_hard_rect(sv, faces, attrs, strip_h, w, background,
                                face_chunk=face_chunk)


def _rasterize_hard_rect(verts, faces, attrs, height, width, background,
                         face_chunk=16):
    """rasterize_hard generalized to non-square outputs (used for baking)."""
    b = verts.shape[0]
    corners, z, color = _face_arrays(verts, faces, attrs)
    f_total = corners.shape[1]
    pad = (-f_total) % face_chunk
    if pad:
        corners = jnp.concatenate(
            [corners, jnp.zeros((b, pad, 3, 2), corners.dtype)], axis=1)
        z = jnp.concatenate([z, jnp.full((b, pad), BIG_Z, z.dtype)], axis=1)
        color = jnp.concatenate([color, jnp.zeros((b, pad, 3), color.dtype)], axis=1)
    n_chunks = corners.shape[1] // face_chunk
    corners = jnp.moveaxis(corners.reshape(b, n_chunks, face_chunk, 3, 2), 1, 0)
    z = jnp.moveaxis(z.reshape(b, n_chunks, face_chunk), 1, 0)
    color = jnp.moveaxis(color.reshape(b, n_chunks, face_chunk, 3), 1, 0)

    px = jnp.broadcast_to((jnp.arange(height, dtype=verts.dtype) + 0.5)[:, None],
                          (height, width))
    py = jnp.broadcast_to((jnp.arange(width, dtype=verts.dtype) + 0.5)[None, :],
                          (height, width))

    def body(carry, chunk):
        best_z, best_color = carry
        cc, cz, ccol = chunk
        cover = _coverage_hard(cc, px, py)
        for f in range(face_chunk):
            zval = jnp.where(cover[:, f], cz[:, f, None, None], BIG_Z)
            better = zval < best_z
            best_z = jnp.where(better, zval, best_z)
            best_color = jnp.where(better[..., None],
                                   ccol[:, f, None, None, :], best_color)
        return (best_z, best_color), None

    init = (jnp.full((b, height, width), BIG_Z, verts.dtype), background)
    (_, best_color), _ = jax.lax.scan(body, init, (corners, z, color))
    return best_color


def pack_texture_rgb8(texture: Grid2D) -> Grid2D:
    """
    Pack a float RGB texture into one uint32 per texel (0x00BBGGRR): the
    fast sampling path then issues a SINGLE gather per output pixel instead
    of 12 (4 bilinear taps x 3 channels), which is the difference between
    gather-bound and compute-bound rendering on TPU.
    """
    xp = np if isinstance(texture.data, np.ndarray) else jnp
    rgb = xp.clip(xp.asarray(texture.data), 0.0, 1.0)
    q = xp.round(rgb * 255.0).astype(xp.uint32)
    packed = q[..., 0] | (q[..., 1] << 8) | (q[..., 2] << 16)
    return Grid2D(data=packed[..., None], origin=texture.origin,
                  cell_size=texture.cell_size)


def sample_background_packed(texture_packed: Grid2D, cam_xy: jnp.ndarray,
                             cam_sc: jnp.ndarray, scale: float, res: int,
                             background_color: jnp.ndarray,
                             left_handed: bool = False,
                             downsample: int = 1,
                             chw: bool = False) -> jnp.ndarray:
    """
    Nearest-neighbor view of a packed uint32 texture: one gather per pixel.
    Non-differentiable w.r.t. the camera (use :func:`sample_background` for
    training); visually equivalent when texel size <= output pixel size.

    Args:
        downsample: sample the background at res/downsample and bilinearly
            upsample on-chip -- trades background sharpness for a
            quadratic reduction in gather count (gathers are the TPU
            bottleneck; the upsample is pure VPU math).
        chw: emit channels-first (B, 3, H, W) instead of (B, H, W, 3).
    """
    sample_res = res // downsample
    world = _pixel_world_coords(cam_xy, cam_sc, scale, sample_res, left_handed)
    uv = (world - texture_packed.origin) / texture_packed.cell_size
    xi = jnp.round(uv[..., 0]).astype(jnp.int32)
    yi = jnp.round(uv[..., 1]).astype(jnp.int32)
    h, w = texture_packed.data.shape[0], texture_packed.data.shape[1]
    valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
    flat = jnp.asarray(texture_packed.data)[..., 0].reshape(-1)
    idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
    packed = flat[idx]
    r = (packed & 0xFF).astype(jnp.float32) / 255.0
    g = ((packed >> 8) & 0xFF).astype(jnp.float32) / 255.0
    b = ((packed >> 16) & 0xFF).astype(jnp.float32) / 255.0
    if chw:
        img = jnp.stack([r, g, b], axis=1)                   # (B, 3, h, w)
        bg = jnp.asarray(background_color, img.dtype)[None, :, None, None]
        img = jnp.where(valid[:, None], img, bg)
        if downsample > 1:
            img = jax.image.resize(img, (img.shape[0], 3, res, res), 'bilinear')
        return img
    img = jnp.stack([r, g, b], axis=-1)
    bg = jnp.asarray(background_color, img.dtype)
    img = jnp.where(valid[..., None], img, bg)
    if downsample > 1:
        img = jax.image.resize(img, (img.shape[0], res, res, 3), 'bilinear')
    return img


def pack_texture_rgb8_quad(texture: Grid2D) -> Grid2D:
    """
    Repack a float RGB texture so DIFFERENTIABLE bilinear sampling needs one
    4-channel gather per pixel instead of 12 scattered floats.

    Cell (y, x) of the packed grid holds the whole 2x2 interpolation quad
    {(y, x), (y, x+1), (y+1, x), (y+1, x+1)}, each corner as 0x00BBGGRR in
    one int32 (channel order 00, 01, 10, 11). The gather's slice is
    contiguous in the minor dimension, so its cost scales with points, not
    taps — the same trick :func:`torchdrivesim_tpu.ops.grids.pack_bilinear_quad`
    plays for the offroad distance field. Exact for textures baked from
    RGB8 palettes (every bench map texture is).
    """
    xp = np if isinstance(texture.data, np.ndarray) else jnp
    rgb = xp.clip(xp.asarray(texture.data), 0.0, 1.0)
    q = xp.round(rgb * 255.0).astype(xp.uint32)
    packed = q[..., 0] | (q[..., 1] << 8) | (q[..., 2] << 16)
    ppad = xp.pad(packed, ((0, 1), (0, 1)))
    h, w = packed.shape
    data = xp.stack([ppad[:h, :w], ppad[:h, 1:w + 1],
                     ppad[1:h + 1, :w], ppad[1:h + 1, 1:w + 1]],
                    axis=-1).astype(xp.int32)
    return Grid2D(data=data, origin=texture.origin,
                  cell_size=texture.cell_size,
                  valid_shape=texture.valid_shape)


def sample_background_quad(quad_texture: Grid2D, cam_xy: jnp.ndarray,
                           cam_sc: jnp.ndarray, scale: float, res: int,
                           background_color: jnp.ndarray,
                           left_handed: bool = False) -> jnp.ndarray:
    """
    Differentiable bilinear background sampling from a
    :func:`pack_texture_rgb8_quad` grid: ONE int32x4 gather per output pixel.

    Gradients w.r.t. the camera pose flow through the bilinear weights (the
    gathered corner colors are constants), exactly as in
    :func:`sample_background`; values match it bit-for-RGB8 except on the
    outermost texel ring (a straddling quad reads the fill color whole),
    which the bake margin keeps off-road.

    Returns:
        (B, res, res, 3) image.
    """
    world = _pixel_world_coords(cam_xy, cam_sc, scale, res, left_handed)
    uv = (world - quad_texture.origin) / quad_texture.cell_size
    x, y = uv[..., 0], uv[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = (x - x0)[..., None]
    ty = (y - y0)[..., None]
    x0i = jax.lax.stop_gradient(x0).astype(jnp.int32)
    y0i = jax.lax.stop_gradient(y0).astype(jnp.int32)
    h, w = quad_texture.data.shape[0], quad_texture.data.shape[1]
    valid = (x0i >= 0) & (x0i < w - 1) & (y0i >= 0) & (y0i < h - 1)
    xi = jnp.clip(x0i, 0, w - 1)
    yi = jnp.clip(y0i, 0, h - 1)
    g = jnp.asarray(quad_texture.data)[yi, xi]            # (..., 4) int32

    def unpack(p):
        return jnp.stack([(p & 0xFF).astype(jnp.float32),
                          ((p >> 8) & 0xFF).astype(jnp.float32),
                          ((p >> 16) & 0xFF).astype(jnp.float32)],
                         axis=-1) / 255.0

    v00, v01 = unpack(g[..., 0]), unpack(g[..., 1])
    v10, v11 = unpack(g[..., 2]), unpack(g[..., 3])
    top = v00 * (1 - tx) + v01 * tx
    bot = v10 * (1 - tx) + v11 * tx
    img = top * (1 - ty) + bot * ty
    bg = jnp.asarray(background_color, img.dtype)
    return jnp.where(valid[..., None], img, bg)


def _pixel_world_coords(cam_xy: jnp.ndarray, cam_sc: jnp.ndarray, scale: float,
                        res: int, left_handed: bool) -> jnp.ndarray:
    """World coordinates of every output pixel center (B, res, res, 2)."""
    coords = jnp.arange(res, dtype=jnp.float32) + 0.5
    half = res / 2.0
    px_per_m = scale * half
    row = coords[:, None]
    col = coords[None, :]
    forward = (half - row) / px_per_m
    left = (col - half) / px_per_m if left_handed else (half - col) / px_per_m
    forward = jnp.broadcast_to(forward, (res, res))
    left = jnp.broadcast_to(left, (res, res))
    s = cam_sc[:, 0][:, None, None]
    c = cam_sc[:, 1][:, None, None]
    dx = c * forward - s * left
    dy = s * forward + c * left
    return jnp.stack([dx + cam_xy[:, 0][:, None, None],
                      dy + cam_xy[:, 1][:, None, None]], axis=-1)


def sample_background(texture: Grid2D, cam_xy: jnp.ndarray, cam_sc: jnp.ndarray,
                      scale: float, res: int, background_color: jnp.ndarray,
                      left_handed: bool = False) -> jnp.ndarray:
    """
    Per-camera view of the baked background texture: compute each output
    pixel's world position (inverse of :func:`camera_rows_cols`) and sample
    bilinearly. Differentiable w.r.t. the camera pose.

    Returns:
        (B, res, res, 3) image.
    """
    world = _pixel_world_coords(cam_xy, cam_sc, scale, res, left_handed)
    img = bilinear_sample(texture, world, fill_value=-1.0)
    # out-of-texture pixels (negative sentinel) -> background color
    bg = jnp.asarray(background_color, img.dtype)
    return jnp.where(img < 0, bg, img)
