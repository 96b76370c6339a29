"""
Point-to-triangle-mesh distance, the exact op behind the offroad metric.

Follows the math of the reference's pure-torch fallback
(`infractions.py:86-173`): squared distance from each point to the closest
triangle, where the distance is 0 inside a (non-degenerate) triangle and the
minimum squared distance to the three edges otherwise. The reference works in
3D with z=0 everywhere; this implementation specializes to 2D directly.

Returned distances are SQUARED, matching both reference code paths
(pytorch3d's ``point_face_distance`` and the pure-torch fallback).
"""
import jax
import jax.numpy as jnp

MIN_TRIANGLE_AREA = 5e-3  #: same cutoff as `infractions.py:137`


def _point_segment_distance_sq(p: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """
    Squared distance from points to segments (ref: `infractions.py:147-159`).
    All inputs broadcastable (..., 2).
    """
    ab = b - a
    l2 = jnp.sum(ab * ab, axis=-1)
    t = jnp.sum(ab * (p - a), axis=-1) / (l2 + 1e-8)
    t = jnp.clip(t, 0.0, 1.0)
    proj = a + t[..., None] * ab
    d2 = jnp.sum((p - proj) ** 2, axis=-1)
    # degenerate segment: distance to endpoint
    d2_end = jnp.sum((p - b) ** 2, axis=-1)
    return jnp.where(l2 <= 1e-8, d2_end, d2)


def point_to_triangles_distance_sq(points: jnp.ndarray, tris: jnp.ndarray) -> jnp.ndarray:
    """
    Minimum squared distance from each point to a set of triangles.

    Args:
        points: (..., P, 2).
        tris: (..., F, 3, 2); batch dims broadcast against points'.
    Returns:
        (..., P) squared distances (0 inside a triangle).
    """
    p = points[..., :, None, :]            # (..., P, 1, 2)
    v0 = tris[..., None, :, 0, :]          # (..., 1, F, 2)
    v1 = tris[..., None, :, 1, :]
    v2 = tris[..., None, :, 2, :]

    # inside test via barycentric coordinates (ref: `infractions.py:120-145`)
    p0 = v1 - v0
    p1 = v2 - v0
    p2 = p - v0
    d00 = jnp.sum(p0 * p0, axis=-1)
    d01 = jnp.sum(p0 * p1, axis=-1)
    d11 = jnp.sum(p1 * p1, axis=-1)
    d20 = jnp.sum(p2 * p0, axis=-1)
    d21 = jnp.sum(p2 * p1, axis=-1)
    denom = d00 * d11 - d01 * d01 + 1e-8
    w1 = (d11 * d20 - d01 * d21) / denom
    w2 = (d00 * d21 - d01 * d20) / denom
    w0 = 1.0 - w1 - w2
    inside = ((0.0 <= w0) & (w0 <= 1.0) & (0.0 <= w1) & (w1 <= 1.0)
              & (0.0 <= w2) & (w2 <= 1.0))
    area = jnp.abs(p0[..., 0] * p1[..., 1] - p0[..., 1] * p1[..., 0]) / 2
    inside = inside & (area >= MIN_TRIANGLE_AREA)

    e01 = _point_segment_distance_sq(p, v0, v1)
    e02 = _point_segment_distance_sq(p, v0, v2)
    e12 = _point_segment_distance_sq(p, v1, v2)
    edge_d2 = jnp.minimum(jnp.minimum(e01, e02), e12)

    d2 = jnp.where(inside, 0.0, edge_d2)   # (..., P, F)
    d2 = jnp.min(d2, axis=-1)
    return jnp.nan_to_num(d2, nan=0.0)


def point_to_triangles_distance_sq_chunked(points: jnp.ndarray, tris: jnp.ndarray,
                                           chunk: int = 2048) -> jnp.ndarray:
    """
    Memory-bounded variant: scans over face chunks so the (P, F) pairwise
    buffer never materializes for large maps (Town01 has ~30k faces).
    """
    f = tris.shape[-3]
    if f <= chunk:
        return point_to_triangles_distance_sq(points, tris)
    pad = (-f) % chunk
    if pad:
        # pad with far-away degenerate triangles
        filler = jnp.full(tris.shape[:-3] + (pad, 3, 2), 1e9, dtype=tris.dtype)
        tris = jnp.concatenate([tris, filler], axis=-3)
    n_chunks = tris.shape[-3] // chunk
    tris_c = jnp.moveaxis(
        tris.reshape(tris.shape[:-3] + (n_chunks, chunk, 3, 2)), -4, 0)

    def body(carry, t):
        d2 = point_to_triangles_distance_sq(points, t)
        return jnp.minimum(carry, d2), None

    init = jnp.full(points.shape[:-1], jnp.inf, dtype=points.dtype)
    out, _ = jax.lax.scan(body, init, tris_c)
    return out
