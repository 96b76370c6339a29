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


def test_diff_warp_forward_matches_bilinear_warp():
    tex = _checker_texture()
    mip = pw.build_mip_pyramid(tex)[0]
    scale = 2.0 / 80.0
    cam_xy = jnp.asarray([[128.0, 130.0], [100.0, 90.0]])
    psi = np.deg2rad([30.0, -45.0])
    cam_sc = jnp.asarray(np.stack([np.sin(psi), np.cos(psi)], -1), jnp.float32)
    bg = jnp.asarray([0.25, 0.5, 0.75])
    got = np.asarray(pw.warp_background_diff(mip, cam_xy, cam_sc, scale, bg))
    want = np.asarray(pw.warp_background_bilinear(mip, cam_xy, cam_sc,
                                                  scale, bg))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize('psi_deg,left_handed', [
    (0, False), (33, False), (90, False), (135, False), (-71, False),
    (100, True),
])
def test_bilinear_warp_exact_on_linear_texture(psi_deg, left_handed):
    """The two-pass linear filter reproduces LINEAR functions of the texel
    coordinates exactly (the hat basis reproduces linear functions in each
    pass, and the pass-1 shear is itself affine), and the ramp texture
    packs to 8 bits without quantization error -- so the bilinear warp
    must equal the closed form to f32 accuracy at ANY rotation."""
    mip = pw.build_mip_pyramid(_ramp_texture())[0]
    scale = 2.0 / 80.0
    psi = np.deg2rad(psi_deg)
    cam_xy = jnp.asarray([[128.0, 130.0]])
    cam_sc = jnp.asarray([[np.sin(psi), np.cos(psi)]], jnp.float32)
    bg = jnp.asarray([0.0, 0.0, 0.0])
    got = np.asarray(pw.warp_background_bilinear(
        mip, cam_xy, cam_sc, scale, bg, left_handed=left_handed))
    ty, tx = pw._sample_positions(mip, cam_xy, cam_sc, scale,
                                  left_handed=left_handed)
    want = np.stack([np.asarray(ty), np.asarray(tx),
                     np.full_like(np.asarray(ty), 77.0)], axis=1) / 255.0
    np.testing.assert_allclose(got, want, atol=2e-4)


@pytest.mark.parametrize('psi_deg', [0, 90, 180, -90])
def test_bilinear_warp_axis_aligned_matches_direct_bilinear(psi_deg):
    """At axis-aligned rotations the pass-1 shear coefficient vanishes, so
    the two-pass filter equals direct 2D bilinear sampling -- certified on
    the hard-edged checker texture (packing quantization only)."""
    from torchdrivesim_tpu.ops.rasterize import sample_background
    tex = _checker_texture()
    mip = pw.build_mip_pyramid(tex)[0]
    scale = 2.0 / 80.0
    psi = np.deg2rad(psi_deg)
    cam_xy = jnp.asarray([[128.0, 130.0]])
    cam_sc = jnp.asarray([[np.sin(psi), np.cos(psi)]], jnp.float32)
    bg = jnp.asarray([0.25, 0.5, 0.75])
    got = np.asarray(pw.warp_background_bilinear(mip, cam_xy, cam_sc,
                                                 scale, bg))
    want = np.asarray(jnp.transpose(sample_background(
        tex, cam_xy, cam_sc, scale, 128, bg), (0, 3, 1, 2)))
    np.testing.assert_allclose(got, want, atol=2 / 255.0)


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


@pytest.mark.integration
def test_diff_warp_town02_gradient_fidelity():
    """Pose-gradient fidelity of the diff-fast background on a REAL map
    texture (baked Town02) with training-like SMOOTH cotangents: the
    estimator must track the analytic gradient of its own mip-level
    bilinear forward almost exactly, and correlate strongly with the exact
    full-resolution bilinear gradient (full distribution in docs/design.md;
    measured by tools/diff_bias_check.py -- pooled cos 0.999 / 0.88 over
    16 poses)."""
    from torchdrivesim_tpu.benchmark import load_or_bake_texture
    from torchdrivesim_tpu.map import find_map_config
    from torchdrivesim_tpu.ops.rasterize import (
        pack_texture_rgb8_quad, sample_background, sample_background_quad)
    from torchdrivesim_tpu.rendering.base import (
        get_default_color_map, get_default_rendering_levels)

    res, fov = 64, 70.0
    cfg = find_map_config('carla_Town02')
    texture = load_or_bake_texture(cfg, get_default_color_map(),
                                   get_default_rendering_levels())
    quad = pack_texture_rgb8_quad(texture)
    pyramid = pw.build_mip_pyramid(texture)
    scale = 2.0 / fov
    mip = pw.select_mip(pyramid, fov=fov, res=res)
    packed = np.asarray(mip.data[..., 0])
    vh, vw = mip.valid_shape or packed.shape
    mip_float = Grid2D(
        data=np.stack([(packed >> s) & 255 for s in (0, 8, 16)],
                      axis=-1)[:vh, :vw].astype(np.float32) / 255.0,
        origin=np.asarray(mip.origin, np.float32),
        cell_size=float(mip.cell_size))

    r = np.arange(res) / res
    w = (np.sin(2 * np.pi * 2 * r)[:, None]
         * np.cos(2 * np.pi * 1.5 * r)[None, :]
         + 0.3 * np.sin(2 * np.pi * 3 * r)[None, :])
    weight = jnp.asarray(np.stack([w, 0.7 * w + 0.3, -0.5 * w])[None],
                         jnp.float32)
    bg = jnp.asarray([0.1, 0.2, 0.3], jnp.float32)

    def loss_warp(cxy, csc):
        img = pw.warp_background_diff(mip, cxy, csc, scale, bg, res=res)
        return jnp.sum(img * weight)

    def loss_exact(cxy, csc):
        img = sample_background_quad(quad, cxy, csc, scale, res, bg)
        return jnp.sum(jnp.transpose(img, (0, 3, 1, 2)) * weight)

    def loss_mip(cxy, csc):
        img = sample_background(mip_float, cxy, csc, scale, res, bg)
        return jnp.sum(jnp.transpose(img, (0, 3, 1, 2)) * weight)

    g_warp = jax.jit(jax.grad(loss_warp, argnums=(0, 1)))
    g_exact = jax.jit(jax.grad(loss_exact, argnums=(0, 1)))
    g_mip = jax.jit(jax.grad(loss_mip, argnums=(0, 1)))

    rng = np.random.RandomState(0)
    xs = rng.uniform(20, 180, 6)
    ys = rng.uniform(110, 300, 6)
    psis = rng.uniform(-np.pi, np.pi, 6)
    flat = lambda fn, cxy, csc: np.concatenate(
        [np.asarray(t).ravel() for t in fn(cxy, csc)])
    gw, ge, gm = [], [], []
    for i in range(6):
        cxy = jnp.asarray([[xs[i], ys[i]]], jnp.float32)
        csc = jnp.asarray([[np.sin(psis[i]), np.cos(psis[i])]], jnp.float32)
        gw.append(flat(g_warp, cxy, csc))
        ge.append(flat(g_exact, cxy, csc))
        gm.append(flat(g_mip, cxy, csc))
    gw, ge, gm = map(np.concatenate, (gw, ge, gm))

    cos_mip = gw @ gm / (np.linalg.norm(gw) * np.linalg.norm(gm) + 1e-12)
    cos_exact = gw @ ge / (np.linalg.norm(gw) * np.linalg.norm(ge) + 1e-12)
    relerr_mip = np.linalg.norm(gw - gm) / (np.linalg.norm(gm) + 1e-12)
    assert cos_mip > 0.99, f"cos vs mip-bilinear {cos_mip:.4f}"
    assert relerr_mip < 0.10, f"relerr vs mip-bilinear {relerr_mip:.4f}"
    # correlation floor only: the mip-blurred objective's gradient is a
    # box-filtered version of the full-res one (0.88 pooled over 16 poses;
    # this 6-pose subset measures 0.62)
    assert cos_exact > 0.55, f"cos vs full-res exact {cos_exact:.4f}"


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
