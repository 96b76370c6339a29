"""
Res-general fast rendering: resolutions above the 128-px warp window render
through a 2x2 sub-camera decomposition over the fused Pallas kernel
(`rendering/jax_renderer.py:_expand_subcameras`), and sub-128 resolutions
without a 4096-pixel band tiling (e.g. 96, 32) run the band-general kernels.
All must reproduce the XLA reference content (same tolerance class as the
existing banded-vs-XLA tests: rasterizer edge/tie rules differ slightly).

Reference behavior: the reference renders any square resolution through its
fast backends (`torchdrivesim/rendering/base.py:167-204`).
"""
import functools

import jax.numpy as jnp
import numpy as np
import pytest

from torchdrivesim_tpu.ops.grids import Grid2D
from torchdrivesim_tpu.rendering.base import Cameras, JaxRendererConfig
from torchdrivesim_tpu.rendering.jax_renderer import JaxRenderer
from torchdrivesim_tpu.utils import Resolution


def _force_pallas_interpret(monkeypatch):
    import torchdrivesim_tpu.ops.pallas_fused as F
    import torchdrivesim_tpu.ops.pallas_rasterize as R
    import torchdrivesim_tpu.ops.pallas_warp as W
    import torchdrivesim_tpu.rendering.jax_renderer as jr
    monkeypatch.setattr(jr, '_on_tpu', lambda: True)
    for mod in (W, R, F):
        original = mod.pl.pallas_call
        monkeypatch.setattr(mod.pl, 'pallas_call',
                            functools.partial(original, interpret=True))


def _scene(seed=0, b=2, q=24, t=10, extent=60.0):
    rng = np.random.RandomState(seed)
    c0 = rng.rand(b, q, 2) * 2 * extent - extent
    e1 = rng.randn(b, q, 2) * 5
    e2 = rng.randn(b, q, 2) * 5
    quads = jnp.asarray(
        np.stack([c0, c0 + e1, c0 + e1 + e2, c0 + e2], axis=2), jnp.float32)
    tris = jnp.asarray(rng.rand(b, t, 3, 2) * 2 * extent - extent,
                       jnp.float32)
    qz = jnp.asarray(rng.rand(b, q), jnp.float32)
    tz = jnp.asarray(rng.rand(b, t), jnp.float32)
    qc = jnp.asarray(rng.uniform(0.2, 1.0, (b, q, 3)), jnp.float32)
    tc = jnp.asarray(rng.uniform(0.2, 1.0, (b, t, 3)), jnp.float32)
    ang = rng.rand(b) * 2 * np.pi
    cam_xy = jnp.asarray(rng.rand(b, 2) * 20 - 10, jnp.float32)
    cam_sc = jnp.asarray(np.stack([np.sin(ang), np.cos(ang)], -1),
                         jnp.float32)
    return quads, qz, qc, tris, tz, tc, cam_xy, cam_sc


def _texture():
    """Smooth texture: the two-pass warp's nearest filter may land <= 1
    texel off the direct nearest sample (see test_pallas_warp.py), so the
    background comparison needs |d(tex)/d(texel)| * 255 below the tolerance.
    A quadrant-placement bug displaces the background by ~80+ texels, which
    this texture still catches at ~50+ intensity error."""
    y, x = np.mgrid[0:512, 0:512] / 512.0
    data = np.stack([0.5 + 0.45 * np.sin(2 * np.pi * 2 * x),
                     0.5 + 0.45 * np.sin(2 * np.pi * 2 * y + 1.0),
                     0.5 + 0.45 * np.sin(2 * np.pi * 1.5 * (x + y))],
                    -1).astype(np.float32)
    return Grid2D(data=data,
                  origin=np.asarray([-128.0, -128.0], np.float32),
                  cell_size=0.5)


#: per-size fov keeping the warp on the texture's FINEST mip level (the XLA
#: reference always samples the full-res texture): fov <= 0.5 * size / 1.45
_FOV = {192: 60.0, 256: 80.0, 384: 120.0, 512: 160.0}


@pytest.mark.parametrize('size', [192, 256, 384, 512])
def test_tiled_fused_matches_xla(monkeypatch, size):
    """The n x n tiled fused path at res > 128 (2x2 to 256, 3x3 at 384,
    4x4 at 512) vs the XLA fallback: same prim content and
    (nearest-sampled) background, modulo rasterizer edge rules
    and the warp's <= 1-texel nearest displacement."""
    quads, qz, qc, tris, tz, tc, cam_xy, cam_sc = _scene(extent=0.35 * _FOV[size])
    fov = _FOV[size]
    res = Resolution(size, size)
    cameras = Cameras(cam_xy, cam_sc, 2.0 / fov)
    args = (quads, qz, qc, tris, tz, tc)

    renderer = JaxRenderer(JaxRendererConfig(cull_max_faces=0))
    renderer.cfg.use_pallas = False
    renderer.background_texture = _texture()
    want = np.asarray(renderer.render_prims_chw(*args, res, cameras))

    _force_pallas_interpret(monkeypatch)
    renderer.cfg.use_pallas = True
    renderer.background_texture = _texture()   # rebuild -> mip pyramid
    assert renderer._tiled_mip(2.0 / fov, size) is not None
    got = np.asarray(renderer.render_prims_chw(*args, res, cameras))

    assert got.shape == (2, 3, size, size)
    # tolerance: rasterizer edge rules on prim boundaries + the warp's
    # <= 1-texel nearest displacement over the smooth texture (~3/channel)
    agree = np.isclose(got, want, atol=6.0).all(axis=1).mean()
    assert agree > 0.99, f"tiled fused vs XLA agreement {agree:.4f}"
    assert got.max() > 0


def test_tiled_seams_are_consistent(monkeypatch):
    """Pixels adjacent to the quadrant seams must agree with the XLA render
    at the same rate as the rest of the image (a sub-camera recentering bug
    shows up as a shifted quadrant = a block of disagreement at the seam)."""
    quads, qz, qc, tris, tz, tc, cam_xy, cam_sc = _scene(seed=3, extent=28.0)
    size, fov = 256, 80.0
    cameras = Cameras(cam_xy, cam_sc, 2.0 / fov)
    args = (quads, qz, qc, tris, tz, tc)

    renderer = JaxRenderer(JaxRendererConfig(cull_max_faces=0))
    renderer.cfg.use_pallas = False
    renderer.background_texture = _texture()
    want = np.asarray(
        renderer.render_prims_chw(*args, Resolution(size, size), cameras))
    _force_pallas_interpret(monkeypatch)
    renderer.cfg.use_pallas = True
    renderer.background_texture = _texture()
    got = np.asarray(
        renderer.render_prims_chw(*args, Resolution(size, size), cameras))

    s = size // 2
    ok = np.isclose(got, want, atol=6.0).all(axis=1)
    seam_rows = ok[:, s - 2:s + 2, :].mean()
    seam_cols = ok[:, :, s - 2:s + 2].mean()
    assert seam_rows > 0.99, f"row-seam agreement {seam_rows:.4f}"
    assert seam_cols > 0.99, f"col-seam agreement {seam_cols:.4f}"


def test_tiled_packed_output_matches_float(monkeypatch):
    """packed=True at a tiled resolution must encode exactly the float
    path's 8-bit colors."""
    quads, qz, qc, tris, tz, tc, cam_xy, cam_sc = _scene(seed=5, extent=28.0)
    size, fov = 256, 80.0
    cameras = Cameras(cam_xy, cam_sc, 2.0 / fov)
    args = (quads, qz, qc, tris, tz, tc)

    _force_pallas_interpret(monkeypatch)
    renderer = JaxRenderer(JaxRendererConfig(cull_max_faces=0))
    renderer.background_texture = _texture()
    as_float = renderer.render_prims_chw(*args, Resolution(size, size),
                                         cameras)
    packed = renderer.render_prims_chw(*args, Resolution(size, size),
                                       cameras, packed=True)
    assert packed.dtype == jnp.int32
    assert packed.shape == (2, size, size)
    from torchdrivesim_tpu.rendering.jax_renderer import unpack_rgb8_chw
    got = np.asarray(unpack_rgb8_chw(packed))
    np.testing.assert_array_equal(got, np.round(np.asarray(as_float)))


@pytest.mark.parametrize('size', [96, 192])
def test_banded_prims_general_res_no_texture(monkeypatch, size):
    """Without a texture the prim path runs the band-general banded kernel
    (96: sub-4096 bands; 192: flat bands above 128 lanes) over a flat
    background color; content must match the XLA fallback."""
    quads, qz, qc, tris, tz, tc, cam_xy, cam_sc = _scene(seed=7)
    fov = 100.0
    cameras = Cameras(cam_xy, cam_sc, 2.0 / fov)
    args = (quads, qz, qc, tris, tz, tc)
    res = Resolution(size, size)

    renderer = JaxRenderer(JaxRendererConfig(cull_max_faces=0))
    renderer.cfg.use_pallas = False
    want = np.asarray(renderer.render_prims_chw(*args, res, cameras))
    _force_pallas_interpret(monkeypatch)
    renderer.cfg.use_pallas = True
    got = np.asarray(renderer.render_prims_chw(*args, res, cameras))

    assert got.shape == (2, 3, size, size)
    agree = np.isclose(got, want, atol=0.7).all(axis=1).mean()
    assert agree > 0.99, f"banded vs XLA agreement {agree:.4f} at {size}"
    assert got.max() > 0


@pytest.mark.parametrize('size', [100, 52])
def test_nonmultiple_res_pads_and_crops(monkeypatch, size):
    """A resolution without a whole-vreg band tiling (e.g. 100) renders at
    the next multiple of 16 with a shifted camera and crops -- content must
    match the XLA fallback at the REQUESTED resolution (every square res
    takes a fast path, `torchdrivesim/rendering/base.py:167-204`)."""
    quads, qz, qc, tris, tz, tc, cam_xy, cam_sc = _scene(seed=9, extent=30.0)
    fov = 100.0
    cameras = Cameras(cam_xy, cam_sc, 2.0 / fov)
    args = (quads, qz, qc, tris, tz, tc)
    res = Resolution(size, size)

    renderer = JaxRenderer(JaxRendererConfig(cull_max_faces=0))
    renderer.cfg.use_pallas = False
    want = np.asarray(renderer.render_prims_chw(*args, res, cameras))
    _force_pallas_interpret(monkeypatch)
    renderer.cfg.use_pallas = True
    assert not renderer._use_pallas(size)       # no direct band tiling
    assert renderer._pad_res_target(size) == -(-size // 16) * 16
    got = np.asarray(renderer.render_prims_chw(*args, res, cameras))

    assert got.shape == (2, 3, size, size)
    assert np.isfinite(got).all()
    # half-pixel world shift: prim edges land sub-pixel differently, so
    # compare content agreement like the other banded-vs-XLA tests
    agree = np.isclose(got, want, atol=0.7).all(axis=1).mean()
    assert agree > 0.98, f"pad-and-crop vs XLA agreement {agree:.4f}"
    assert got.max() > 0


def test_pad_crop_textured_matches_xla(monkeypatch):
    """Pad-and-crop with a background texture: the camera shift must leave
    the sampled background in the requested view (a shift-direction bug
    displaces the whole background by (pad-size)/2 pixels)."""
    quads, qz, qc, tris, tz, tc, cam_xy, cam_sc = _scene(seed=11, extent=20.0)
    size, fov = 100, 48.0
    cameras = Cameras(cam_xy, cam_sc, 2.0 / fov)
    args = (quads, qz, qc, tris, tz, tc)
    res = Resolution(size, size)

    renderer = JaxRenderer(JaxRendererConfig(cull_max_faces=0))
    renderer.cfg.use_pallas = False
    renderer.background_texture = _texture()
    want = np.asarray(renderer.render_prims_chw(*args, res, cameras))
    _force_pallas_interpret(monkeypatch)
    renderer.cfg.use_pallas = True
    renderer.background_texture = _texture()
    got = np.asarray(renderer.render_prims_chw(*args, res, cameras))
    agree = np.isclose(got, want, atol=6.0).all(axis=1).mean()
    assert agree > 0.98, f"textured pad-and-crop agreement {agree:.4f}"
