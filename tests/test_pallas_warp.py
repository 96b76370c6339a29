import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torchdrivesim_tpu.ops.pallas_warp as pw
from torchdrivesim_tpu.ops.grids import Grid2D
from torchdrivesim_tpu.ops.rasterize import (
    pack_texture_rgb8, sample_background_packed,
)


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    original = pw.pl.pallas_call
    monkeypatch.setattr(pw.pl, 'pallas_call',
                        functools.partial(original, interpret=True))
    yield


def _checker_texture(h=256, w=256, cell=1.0):
    rng = np.random.RandomState(0)
    data = np.zeros((h, w, 3), np.float32)
    data[..., 0] = ((np.arange(h)[:, None] // 16 + np.arange(w)[None] // 16) % 2)
    data[..., 1] = rng.rand(h, w) > 0.5
    data[..., 2] = np.linspace(0, 1, w)[None]
    return Grid2D(data=jnp.asarray(data), origin=jnp.asarray([0.0, 0.0]),
                  cell_size=cell)


def test_mip_pyramid_shapes():
    tex = _checker_texture()
    levels = pw.build_mip_pyramid(tex)
    assert len(levels) >= 2
    # levels are padded so any 128-aligned origin has a full 256 window
    assert levels[0].data.shape[:2] == (384, 384)
    assert levels[0].valid_shape == (256, 256)
    assert levels[1].valid_shape == (128, 128)
    assert levels[1].cell_size == 2.0
    # selection: fov such that needed cell is ~1.45 -> picks the 2.0 level
    assert pw.select_mip(levels, fov=128.0).cell_size == 2.0
    assert pw.select_mip(levels, fov=60.0).cell_size == 1.0


@pytest.mark.parametrize('psi_deg,left_handed', [
    (0, False), (30, False), (90, False), (135, False), (222, False),
    (-45, False), (30, True), (100, True),
])
def test_warp_matches_xla_sampler(psi_deg, left_handed):
    tex = _checker_texture()
    levels = pw.build_mip_pyramid(tex)
    mip = levels[0]  # same cell as the packed reference
    packed = pack_texture_rgb8(tex)
    fov = 100.0  # window 128 texels at cell 1.0 covers fov*1.45=145? no ->
    # use fov small enough: 128 * 1.0 / 1.45 = 88
    fov = 80.0
    scale = 2.0 / fov
    psi = np.deg2rad(psi_deg)
    cam_xy = jnp.asarray([[128.0, 130.0]])
    cam_sc = jnp.asarray([[np.sin(psi), np.cos(psi)]], dtype=jnp.float32)
    bg = jnp.asarray([0.25, 0.5, 0.75])

    got = np.asarray(pw.warp_background_pallas(
        mip, cam_xy, cam_sc, scale, bg, left_handed=left_handed))
    want = np.asarray(sample_background_packed(
        packed, cam_xy, cam_sc, scale, 128, bg, left_handed=left_handed,
        chw=True))
    # two-pass nearest may pick a texel displaced by <= 1 from the direct
    # nearest sample; demand high exact agreement plus a neighborhood
    # envelope for the rest
    tol = 1 / 255.0 + 1e-6
    agree = np.isclose(got, want, atol=tol).all(axis=1).mean()
    assert agree > 0.85, f"exact agreement {agree:.3f} at psi={psi_deg}"
    from scipy.ndimage import grey_dilation, grey_erosion
    lo_tex = Grid2D(data=jnp.asarray(np.stack([
        grey_erosion(np.asarray(tex.data)[..., ch], size=3)
        for ch in range(3)], -1)), origin=tex.origin, cell_size=tex.cell_size)
    hi_tex = Grid2D(data=jnp.asarray(np.stack([
        grey_dilation(np.asarray(tex.data)[..., ch], size=3)
        for ch in range(3)], -1)), origin=tex.origin, cell_size=tex.cell_size)
    lo = np.asarray(sample_background_packed(
        pack_texture_rgb8(lo_tex), cam_xy, cam_sc, scale, 128,
        jnp.zeros(3), left_handed=left_handed, chw=True))
    hi = np.asarray(sample_background_packed(
        pack_texture_rgb8(hi_tex), cam_xy, cam_sc, scale, 128,
        jnp.ones(3), left_handed=left_handed, chw=True))
    in_envelope = ((got >= lo - tol) & (got <= hi + tol)).all(axis=1).mean()
    assert in_envelope > 0.999, f"envelope {in_envelope:.4f} at psi={psi_deg}"


@pytest.mark.parametrize('psi_deg,left_handed', [
    (0, False), (30, False), (135, False), (100, True),
])
def test_warp_res64_matches_xla_sampler(psi_deg, left_handed):
    """The generalized kernel at res=64 (RL config) vs the direct sampler."""
    tex = _checker_texture()
    res = 64
    levels = pw.build_mip_pyramid(tex)
    mip = levels[0]  # same cell as the packed reference
    packed = pack_texture_rgb8(tex)
    fov = 80.0
    scale = 2.0 / fov
    psi = np.deg2rad(psi_deg)
    cam_xy = jnp.asarray([[128.0, 130.0]])
    cam_sc = jnp.asarray([[np.sin(psi), np.cos(psi)]], dtype=jnp.float32)
    bg = jnp.asarray([0.25, 0.5, 0.75])

    got = np.asarray(pw.warp_background_pallas(
        mip, cam_xy, cam_sc, scale, bg, left_handed=left_handed, res=res))
    assert got.shape == (1, 3, res, res)
    want = np.asarray(sample_background_packed(
        packed, cam_xy, cam_sc, scale, res, bg, left_handed=left_handed,
        chw=True))
    tol = 1 / 255.0 + 1e-6
    agree = np.isclose(got, want, atol=tol).all(axis=1).mean()
    assert agree > 0.85, f"exact agreement {agree:.3f} at psi={psi_deg}"


def test_warp_off_texture_is_background():
    tex = _checker_texture(h=128, w=128, cell=1.0)
    mip = pw.build_mip_pyramid(tex)[0]
    bg = jnp.asarray([0.1, 0.2, 0.3])
    # camera far off the texture
    got = np.asarray(pw.warp_background_pallas(
        mip, jnp.asarray([[4000.0, 4000.0]]),
        jnp.asarray([[0.0, 1.0]]), 2.0 / 80, bg))
    np.testing.assert_allclose(got[0, 0], 0.1, atol=1 / 255.0)
    np.testing.assert_allclose(got[0, 1], 0.2, atol=1 / 255.0)
    np.testing.assert_allclose(got[0, 2], 0.3, atol=1 / 255.0)


def _ramp_texture(h=256, w=256, cell=1.0):
    """Globally LINEAR channels (R = ty/255, G = tx/255, B const): bilinear
    sampling of these is an exact linear function of the texel coordinates,
    so the pose gradient has a closed form to certify the diff warp
    against."""
    data = np.zeros((h, w, 3), np.float32)
    data[..., 0] = (np.arange(h) / 255.0)[:, None]
    data[..., 1] = (np.arange(w) / 255.0)[None, :]
    data[..., 2] = 77 / 255.0
    return Grid2D(data=jnp.asarray(data), origin=jnp.asarray([0.0, 0.0]),
                  cell_size=cell)


def test_diff_warp_forward_matches_fast_warp():
    tex = _checker_texture()
    mip = pw.build_mip_pyramid(tex)[0]
    scale = 2.0 / 80.0
    cam_xy = jnp.asarray([[128.0, 130.0], [100.0, 90.0]])
    psi = np.deg2rad([30.0, -45.0])
    cam_sc = jnp.asarray(np.stack([np.sin(psi), np.cos(psi)], -1), jnp.float32)
    bg = jnp.asarray([0.25, 0.5, 0.75])
    got = np.asarray(pw.warp_background_diff(mip, cam_xy, cam_sc, scale, bg))
    want = np.asarray(pw.warp_background_pallas(mip, cam_xy, cam_sc, scale, bg))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize('psi_deg,left_handed', [
    (0, False), (30, False), (135, False), (100, True),
])
def test_diff_warp_pose_gradient_matches_analytic(psi_deg, left_handed):
    mip = pw.build_mip_pyramid(_ramp_texture())[0]
    scale = 2.0 / 80.0
    psi = np.deg2rad(psi_deg)
    cam_xy = jnp.asarray([[128.0, 130.0]])
    cam_sc = jnp.asarray([[np.sin(psi), np.cos(psi)]], jnp.float32)
    bg = jnp.asarray([0.0, 0.0, 0.0])
    # smooth per-pixel weights so the comparison exercises non-uniform
    # cotangents, not just the mean gradient
    r = np.arange(128) / 127.0
    w_pix = (0.6 + 0.4 * np.sin(np.pi * r)[:, None] * np.cos(
        np.pi * r)[None, :]).astype(np.float32)
    w = jnp.asarray(np.stack([w_pix, 0.5 * w_pix, 0.25 * w_pix])[None])

    def loss(cxy, csc):
        img = pw.warp_background_diff(mip, cxy, csc, scale, bg,
                                      left_handed=left_handed)
        return jnp.sum(img * w)

    # exact gradient of the linear-texture loss: sum_p (wR*ty + wG*tx)/255
    def ref_loss(cxy, csc):
        ty, tx = pw._sample_positions(mip, cxy, csc, scale,
                                      left_handed=left_handed)
        return jnp.sum(w[:, 0] * ty + w[:, 1] * tx) / 255.0

    gxy, gsc = jax.grad(loss, argnums=(0, 1))(cam_xy, cam_sc)
    rxy, rsc = jax.grad(ref_loss, argnums=(0, 1))(cam_xy, cam_sc)
    # the estimator differences a nearest-sampled (quantized) image; over
    # 16k pixels the texel-step noise averages to a few percent
    np.testing.assert_allclose(np.asarray(gxy), np.asarray(rxy),
                               rtol=0.05, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gsc), np.asarray(rsc),
                               rtol=0.05, atol=0.15)


def test_diff_warp_off_texture_gradient_is_zero():
    mip = pw.build_mip_pyramid(_checker_texture())[0]
    scale = 2.0 / 80.0
    cam_xy = jnp.asarray([[5000.0, 5000.0]])  # fully off the texture
    cam_sc = jnp.asarray([[0.0, 1.0]])
    bg = jnp.asarray([0.25, 0.5, 0.75])

    def loss(cxy, csc):
        return jnp.sum(pw.warp_background_diff(mip, cxy, csc, scale, bg))

    gxy, gsc = jax.grad(loss, argnums=(0, 1))(cam_xy, cam_sc)
    np.testing.assert_array_equal(np.asarray(gxy), 0.0)
    np.testing.assert_array_equal(np.asarray(gsc), 0.0)
