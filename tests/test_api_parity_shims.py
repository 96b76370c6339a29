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
    # sigmoid is ALSO a differentiable pytorch3d blend
    # (`rendering/pytorch3d.py:27-35`): it must map to the soft rasterizer
    sig = Pytorch3DRendererConfig(differentiable_rendering='sigmoid')
    assert renderer_from_config(sig).cfg.differentiable
    assert not renderer_from_config(CV2RendererConfig()).cfg.differentiable


def test_use_pallas_gate_requires_whole_bands():
    """The Pallas raster paths tile the image into whole-vreg pixel bands:
    any multiple of 16 has one (res>128 goes through 2x2 sub-camera tiling),
    while unaligned sizes must take the XLA fallback instead of crashing
    in-kernel."""
    from torchdrivesim_tpu.rendering import JaxRendererConfig, jax_renderer
    r = JaxRenderer(JaxRendererConfig())
    orig = jax_renderer._on_tpu
    jax_renderer._on_tpu = lambda: True
    try:
        for res in (32, 64, 96, 128, 256):
            assert r._use_pallas(res), res
        for res in (8, 100, 130):
            assert not r._use_pallas(res), res
    finally:
        jax_renderer._on_tpu = orig


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


def test_assert_pytorch3d_available_is_noop():
    import torchdrivesim_tpu
    torchdrivesim_tpu.assert_pytorch3d_available()   # must not raise


def test_renderer_class_shims():
    from torchdrivesim_tpu.rendering import (
        CV2Renderer, JaxRenderer, JaxRendererConfig, NvdiffrastNotFound,
        NvdiffrastRenderer, Pytorch3DNotFound, Pytorch3DRenderer,
        RenderingBlend)
    for cls in (CV2Renderer, Pytorch3DRenderer, NvdiffrastRenderer):
        assert issubclass(cls, JaxRenderer)
        r = cls(JaxRendererConfig())
        assert hasattr(r, 'render_frame')
    assert RenderingBlend('soft') is RenderingBlend.soft
    assert issubclass(Pytorch3DNotFound, ImportError)
    assert issubclass(NvdiffrastNotFound, ImportError)


def test_point_to_mesh_distance_pt_matches_reference():
    import os, sys
    if not os.path.isdir('/root/reference/torchdrivesim'):
        import pytest
        pytest.skip('reference checkout not available')
    import torch
    # side effect: puts the reference on sys.path and stubs its optional
    # module-scope imports (shapely, omegaconf, ...)
    import tests.test_reference_parity  # noqa: F401
    from torchdrivesim.infractions import point_to_mesh_distance_pt as ref_fn
    from torchdrivesim_tpu.infractions import point_to_mesh_distance_pt

    rng = np.random.RandomState(0)
    points = np.concatenate(
        [rng.uniform(-300, 300, (6, 2)), np.zeros((6, 1))],
        axis=-1).astype(np.float32)
    tris = np.concatenate(
        [rng.uniform(-300, 300, (6, 10, 3, 2)), np.zeros((6, 10, 3, 1))],
        axis=-1).astype(np.float32)
    # put a couple of points clearly inside a triangle
    tris[0, 0] = np.array([[-400, -400, 0], [400, -400, 0], [0, 400, 0]],
                          np.float32)
    ref = ref_fn(torch.tensor(points), torch.tensor(tris)).numpy()
    ours = np.asarray(point_to_mesh_distance_pt(jnp.asarray(points),
                                                jnp.asarray(tris)))
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-2)
    # threshold semantics: values <= threshold become exactly zero
    thr = float(np.median(ref)) + 1e-3
    ref_t = ref_fn(torch.tensor(points), torch.tensor(tris),
                   threshold=thr).numpy()
    ours_t = np.asarray(point_to_mesh_distance_pt(
        jnp.asarray(points), jnp.asarray(tris), threshold=thr))
    np.testing.assert_array_equal(ours_t == 0, ref_t == 0)


def test_get_all_intersections():
    from torchdrivesim_tpu.infractions import get_all_intersections
    # three boxes: 0 and 1 overlap, 2 far away
    rects = np.array([
        [0.0, 0.0, 4.0, 2.0, 0.0],
        [1.0, 0.5, 4.0, 2.0, 0.5],
        [100.0, 100.0, 4.0, 2.0, 1.0],
    ], np.float32)
    m = get_all_intersections(rects)
    assert m.shape == (3, 3)
    assert m[0, 1] == 1.0 and m[0, 2] == 0.0 and m[1, 2] == 0.0
    assert np.all(np.tril(m) == 0), "upper triangular only"
    ego = get_all_intersections(rects, ego_idx=0)
    np.testing.assert_array_equal(ego, [1.0, 0.0])


def test_point_mesh_face_distance_reductions():
    """Reference wrapper semantics (`infractions.py:24-83`): squared L2 to
    the closest face, threshold-after-weighting, keepdim reductions."""
    from torchdrivesim_tpu.infractions import point_mesh_face_distance
    from torchdrivesim_tpu.mesh import BaseMesh
    # one unit right triangle at the origin, batch of 2
    verts = jnp.asarray([[[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]]])
    verts = jnp.tile(verts, (2, 1, 1))
    faces = jnp.tile(jnp.asarray([[[0, 1, 2]]]), (2, 1, 1))
    mesh = BaseMesh(verts=verts, faces=faces)
    # point on the mesh -> 0; point at (2, 0) -> squared distance 1
    points = jnp.asarray([[[0.25, 0.25], [2.0, 0.0]],
                          [[3.0, 0.0], [0.0, 0.0]]])
    d = point_mesh_face_distance(mesh, points, reduction='none')
    np.testing.assert_allclose(np.asarray(d), [[0.0, 1.0], [4.0, 0.0]],
                               atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(point_mesh_face_distance(mesh, points)), [[1.0], [4.0]],
        atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(point_mesh_face_distance(mesh, points, reduction='mean')),
        [[0.5], [2.0]], atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(point_mesh_face_distance(mesh, points, reduction='max')),
        [[1.0], [4.0]], atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(point_mesh_face_distance(mesh, points, reduction='min')),
        [[0.0], [0.0]], atol=1e-6)
    # weighted divides by cloud size BEFORE the threshold is applied
    w = point_mesh_face_distance(mesh, points, weighted=True, threshold=0.6)
    np.testing.assert_allclose(np.asarray(w), [[0.0], [2.0]], atol=1e-6)
    # 3D points route through the reference-shaped pure path
    verts3 = jnp.concatenate([verts, jnp.zeros_like(verts[..., :1])], -1)
    mesh3 = BaseMesh(verts=verts3, faces=faces)
    points3 = jnp.concatenate([points, jnp.zeros_like(points[..., :1])], -1)
    d3 = point_mesh_face_distance(mesh3, points3, reduction='none')
    np.testing.assert_allclose(np.asarray(d3), [[0.0, 1.0], [4.0, 0.0]],
                               atol=1e-5)
