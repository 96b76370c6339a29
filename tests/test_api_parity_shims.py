"""
Migration-shim parity: reference-named helpers and configs must exist and
behave like the reference (`torchdrivesim/rendering/*.py`,
`behavior/iai.py:15-26`, `utils.py:15-28`, `infractions.py:477-500`).
"""
import jax.numpy as jnp
import numpy as np

from torchdrivesim_tpu.behavior.iai import (
    agent_attributes_to_basic_agent_properties,
    agent_properties_to_agent_attributes, unpack_attributes,
)
from torchdrivesim_tpu.infractions import rectangle_vertices
from torchdrivesim_tpu.rendering import (
    CV2RendererConfig, JaxRenderer, NvdiffrastRendererConfig,
    Pytorch3DRendererConfig, renderer_from_config,
)
from torchdrivesim_tpu.utils import isin


def test_reference_renderer_configs_map_to_jax_backend():
    for cfg in (CV2RendererConfig(), NvdiffrastRendererConfig(),
                Pytorch3DRendererConfig(), {'backend': 'cv2'}):
        r = renderer_from_config(cfg)
        assert isinstance(r, JaxRenderer)
    # pytorch3d is the reference's differentiable backend (soft by default)
    assert renderer_from_config(Pytorch3DRendererConfig()).cfg.differentiable
    hard = Pytorch3DRendererConfig(differentiable_rendering='hard')
    assert not renderer_from_config(hard).cfg.differentiable
    assert not renderer_from_config(CV2RendererConfig()).cfg.differentiable


def test_iai_attribute_conversions_round_trip():
    class A:
        length, width, rear_axis_offset = 4.5, 1.9, 1.3
    t = unpack_attributes(A)
    np.testing.assert_allclose(np.asarray(t), [4.5, 1.9, 1.3])
    props = agent_attributes_to_basic_agent_properties(t)
    assert float(props['length']) == 4.5
    back = agent_properties_to_agent_attributes(
        {k: float(v) for k, v in props.items()})
    np.testing.assert_allclose(np.asarray(back), np.asarray(t))


def test_isin():
    x = jnp.asarray([[1, 2], [3, 4]])
    y = jnp.asarray([2, 3])
    np.testing.assert_array_equal(np.asarray(isin(x, y)),
                                  [[False, True], [True, False]])


def test_rectangle_vertices_reference_formula():
    r = np.random.RandomState(1)
    cx, cy, w, h, a = [r.randn(5, 1).astype(np.float32) for _ in range(5)]
    # the reference formula verbatim (infractions.py:489-500)
    dx, dy = w / 2, h / 2
    dxc, dxs = dx * np.cos(a), dx * np.sin(a)
    dyc, dys = dy * np.cos(a), dy * np.sin(a)
    c = np.concatenate([cx, cy], -1)
    ref = np.stack([
        c + np.concatenate([-dxc - -dys, -dxs + -dyc], -1),
        c + np.concatenate([dxc - -dys, dxs + -dyc], -1),
        c + np.concatenate([dxc - dys, dxs + dyc], -1),
        c + np.concatenate([-dxc - dys, -dxs + dyc], -1)], 1)
    np.testing.assert_allclose(
        np.asarray(rectangle_vertices(cx, cy, w, h, a)), ref, atol=1e-6)
    # jax inputs give jax outputs
    out = rectangle_vertices(*map(jnp.asarray, (cx, cy, w, h, a)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)
