"""
The fused warp+rasterize kernel must be bit-exact vs the split pipeline
(``warp_background_pallas`` then ``rasterize_hard_pallas_prims_banded``):
both compute the identical packed-int winner resolution and unpack with the
same arithmetic, so any difference is a bug.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import torchdrivesim_tpu.ops.pallas_fused as F
import torchdrivesim_tpu.ops.pallas_rasterize as R
import torchdrivesim_tpu.ops.pallas_warp as W
from torchdrivesim_tpu.ops.grids import Grid2D
from torchdrivesim_tpu.ops.rasterize import (
    prim_band_chunk_masks, sort_prims_rowmajor,
)


@pytest.fixture
def interpret_mode(monkeypatch):
    """Run the Pallas kernels in interpreter mode on CPU."""
    original = pl.pallas_call
    for mod in (W, R, F):
        monkeypatch.setattr(mod.pl, 'pallas_call',
                            functools.partial(original, interpret=True))


def _scene(seed, b=3, q=30, t=12):
    rng = np.random.RandomState(seed)
    tex = Grid2D(data=jnp.asarray(rng.rand(300, 300, 3), jnp.float32),
                 origin=jnp.zeros(2), cell_size=0.5)
    mip = W.select_mip(W.build_mip_pyramid(tex), fov=40.0)
    cam_xy = jnp.asarray(rng.rand(b, 2) * 120 + 10, jnp.float32)
    ang = rng.rand(b) * 2 * np.pi
    cam_sc = jnp.asarray(np.stack([np.sin(ang), np.cos(ang)], -1), jnp.float32)
    c0 = rng.rand(b, q, 2) * 140 - 6
    e1 = rng.randn(b, q, 2) * 6
    e2 = rng.randn(b, q, 2) * 6
    quads = jnp.asarray(np.stack([c0, c0 + e1, c0 + e1 + e2, c0 + e2], axis=2),
                        jnp.float32)
    tris = jnp.asarray(rng.rand(b, t, 3, 2) * 140 - 6, jnp.float32)
    qz = jnp.asarray(rng.rand(b, q), jnp.float32)
    tz = jnp.asarray(rng.rand(b, t), jnp.float32)
    qc = jnp.asarray(rng.rand(b, q, 3), jnp.float32)
    tc = jnp.asarray(rng.rand(b, t, 3), jnp.float32)
    return mip, cam_xy, cam_sc, quads, qz, qc, tris, tz, tc


@pytest.mark.parametrize('seed,res', [(0, 128), (7, 128), (0, 64), (7, 64),
                                      (0, 96), (3, 32)])
def test_fused_matches_split_pipeline(interpret_mode, seed, res):
    mip, cam_xy, cam_sc, quads, qz, qc, tris, tz, tc = _scene(seed)
    scale = 2.0 / 40.0
    bg_color = jnp.asarray([0.1, 0.2, 0.3])
    n_bands = R.n_bands_for(res)
    sq, qz, qc = sort_prims_rowmajor(quads, qz, qc, res, 56)
    st, tz, tc = sort_prims_rowmajor(tris, tz, tc, res, 56)
    qmask = prim_band_chunk_masks(sq, res, n_bands)
    tmask = prim_band_chunk_masks(st, res, n_bands)

    bg = W.warp_background_pallas(mip, cam_xy, cam_sc, scale, bg_color,
                                  res=res)
    ref = R.rasterize_hard_pallas_prims_banded(
        sq, qz, qc, st, tz, tc, res, bg, qmask, tmask)
    fused = F.render_prims_fused_pallas(
        mip, cam_xy, cam_sc, scale, bg_color, sq, qz, qc, st, tz, tc,
        qmask, tmask, res=res)

    ref, fused, bg = np.asarray(ref), np.asarray(fused), np.asarray(bg)
    # the scene must actually cover pixels for the test to mean anything
    assert (ref != bg).mean() > 0.2
    np.testing.assert_array_equal(fused, ref)


def test_fused_no_prims_is_pure_background(interpret_mode):
    mip, cam_xy, cam_sc, quads, qz, qc, tris, tz, tc = _scene(3)
    scale = 2.0 / 40.0
    bg_color = jnp.asarray([0.5, 0.0, 1.0])
    res = 128
    n_bands = R.n_bands_for(res)
    b = cam_xy.shape[0]
    # degenerate (all-zero) prims with dead masks: only the warp remains
    sq = jnp.zeros((b, 8, 4, 2), jnp.float32)
    st = jnp.zeros((b, 8, 3, 2), jnp.float32)
    z8 = jnp.zeros((b, 8), jnp.float32)
    c8 = jnp.zeros((b, 8, 3), jnp.float32)
    mask = jnp.zeros((b, n_bands, 1, 1), jnp.int32)
    bg = W.warp_background_pallas(mip, cam_xy, cam_sc, scale, bg_color)
    fused = F.render_prims_fused_pallas(
        mip, cam_xy, cam_sc, scale, bg_color, sq, z8, c8, st, z8, c8,
        mask, mask)
    np.testing.assert_array_equal(np.asarray(fused), np.asarray(bg))


@pytest.mark.parametrize('res', [128, 64, 96])
def test_fused_packed_output_matches_float(interpret_mode, res):
    """``packed_output`` must encode exactly the float path's 8-bit colors:
    unpack(packed) == round(float_image * 255) for every pixel."""
    mip, cam_xy, cam_sc, quads, qz, qc, tris, tz, tc = _scene(5)
    scale = 2.0 / 40.0
    bg_color = jnp.asarray([0.1, 0.2, 0.3])
    n_bands = R.n_bands_for(res)
    sq, qz, qc = sort_prims_rowmajor(quads, qz, qc, res, 56)
    st, tz, tc = sort_prims_rowmajor(tris, tz, tc, res, 56)
    qmask = prim_band_chunk_masks(sq, res, n_bands)
    tmask = prim_band_chunk_masks(st, res, n_bands)

    args = (mip, cam_xy, cam_sc, scale, bg_color, sq, qz, qc, st, tz, tc,
            qmask, tmask)
    as_float = F.render_prims_fused_pallas(*args, res=res)
    packed = F.render_prims_fused_pallas(*args, res=res, packed_output=True)
    assert packed.dtype == jnp.int32
    assert packed.shape == (cam_xy.shape[0], res, res)

    from torchdrivesim_tpu.rendering.jax_renderer import unpack_rgb8_chw
    got = np.asarray(unpack_rgb8_chw(packed))
    want = np.round(np.asarray(as_float) * 255.0)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize('b', [1, 5])
def test_fused_camera_batching_padding(interpret_mode, b):
    """Batch sizes that don't divide CAMS_PER_PROGRAM exercise the pad path."""
    mip, cam_xy, cam_sc, quads, qz, qc, tris, tz, tc = _scene(11, b=b)
    scale = 2.0 / 40.0
    bg_color = jnp.asarray([0.3, 0.3, 0.3])
    res = 128
    n_bands = R.n_bands_for(res)
    sq, qz, qc = sort_prims_rowmajor(quads, qz, qc, res, 56)
    st, tz, tc = sort_prims_rowmajor(tris, tz, tc, res, 56)
    qmask = prim_band_chunk_masks(sq, res, n_bands)
    tmask = prim_band_chunk_masks(st, res, n_bands)
    bg = W.warp_background_pallas(mip, cam_xy, cam_sc, scale, bg_color)
    ref = R.rasterize_hard_pallas_prims_banded(
        sq, qz, qc, st, tz, tc, res, bg, qmask, tmask)
    fused = F.render_prims_fused_pallas(
        mip, cam_xy, cam_sc, scale, bg_color, sq, qz, qc, st, tz, tc,
        qmask, tmask)
    np.testing.assert_array_equal(np.asarray(fused), np.asarray(ref))


def test_flat_path_matches_2d_default(monkeypatch):
    """The retained flat (relayout) path must stay bit-identical to the 2D
    default at res 128 -- it is kept as the A/B reference
    (TDS_FUSED_FLAT=1) and would otherwise be unreachable in CI."""
    import functools

    import torchdrivesim_tpu.ops.pallas_fused as PF
    import torchdrivesim_tpu.ops.pallas_warp as PW
    from torchdrivesim_tpu.ops.grids import Grid2D
    from torchdrivesim_tpu.ops.rasterize import (
        sort_prims_rowmajor_with_masks)

    for mod in (PF, PW):
        monkeypatch.setattr(mod.pl, 'pallas_call', functools.partial(
            mod.pl.pallas_call, interpret=True))

    rng = np.random.RandomState(5)
    b, q, t, res = 4, 20, 12, 128
    c0 = rng.uniform(-20, 140, (b, q, 2))
    e1 = rng.randn(b, q, 2) * 12
    e2 = rng.randn(b, q, 2) * 12
    quads = jnp.asarray(np.stack([c0, c0 + e1, c0 + e1 + e2, c0 + e2], 2),
                        jnp.float32)
    tris = jnp.asarray(rng.uniform(-20, 140, (b, t, 3, 2)), jnp.float32)
    qz = jnp.asarray(rng.rand(b, q), jnp.float32)
    tz = jnp.asarray(rng.rand(b, t), jnp.float32)
    qc = jnp.asarray(rng.rand(b, q, 3), jnp.float32)
    tc = jnp.asarray(rng.rand(b, t, 3), jnp.float32)
    mip = Grid2D(
        data=jnp.asarray(rng.randint(0, 2 ** 24, (256, 256, 1)).astype(
            np.int32)),
        origin=np.asarray([-60.0, -60.0], np.float32),
        cell_size=np.float32(2.0 / 70 * PW.MIP_FACTOR))
    cam_xy = jnp.asarray(rng.uniform(-5, 5, (b, 2)), jnp.float32)
    th = rng.uniform(0, 6.28, b).astype(np.float32)
    cam_sc = jnp.stack([jnp.asarray(np.sin(th)), jnp.asarray(np.cos(th))],
                       -1)
    bg = jnp.asarray([0.1, 0.2, 0.3])

    sq, qz2, qc2, qm = sort_prims_rowmajor_with_masks(quads, qz, qc, res,
                                                      56, 4)
    st, tz2, tc2, tm = sort_prims_rowmajor_with_masks(tris, tz, tc, res,
                                                      56, 4)

    def render():
        return np.asarray(PF.render_prims_fused_pallas(
            mip, cam_xy, cam_sc, 2.0 / 70, bg, sq, qz2, qc2, st, tz2, tc2,
            qm, tm))

    img_2d = render()                       # default
    monkeypatch.setattr(PF, '_FORCE_FLAT', True)
    img_flat = render()
    np.testing.assert_array_equal(img_2d, img_flat)
    assert img_2d.max() > 0
