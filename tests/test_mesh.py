import os

import jax.numpy as jnp
import numpy as np
import pytest

from torchdrivesim_tpu.mesh import (
    AttributeMesh, BaseMesh, BirdviewMesh, RGBMesh, build_verts_faces_from_bounding_box,
    generate_annulus_polygon_mesh, generate_disc_mesh, generate_trajectory_mesh,
    rendering_mesh, set_colors_with_defaults, tensor_color,
)


def _square_mesh(offset=0.0):
    verts = jnp.asarray([[[0., 0.], [1., 0.], [1., 1.], [0., 1.]]]) + offset
    faces = jnp.asarray([[[0, 1, 2], [0, 2, 3]]])
    return BaseMesh(verts=verts, faces=faces)


class TestBaseMesh:
    def test_shapes_and_props(self):
        m = _square_mesh()
        assert m.batch_size == 1 and m.verts_count == 4 and m.faces_count == 2
        assert m.dim == 2
        np.testing.assert_allclose(np.asarray(m.center), [[0.5, 0.5]])

    def test_expand_contiguous(self):
        m = BaseMesh(verts=jnp.asarray([[[0., 0.]], [[1., 1.]]]),
                     faces=jnp.zeros((2, 1, 3), jnp.int32))
        e = m.expand(2)
        assert e.batch_size == 4
        np.testing.assert_allclose(np.asarray(e.verts)[:, 0, 0], [0, 0, 1, 1])

    def test_select(self):
        m = _square_mesh().expand(3)
        s = m[jnp.asarray([2, 0])]
        assert s.batch_size == 2

    def test_concat_offsets_faces(self):
        a, b = _square_mesh(), _square_mesh(offset=5.0)
        c = BaseMesh.concat([a, b])
        assert c.verts_count == 8 and c.faces_count == 4
        assert int(jnp.min(c.faces[0, 2:])) >= 4

    def test_collate_pads(self):
        a = _square_mesh()
        tri = BaseMesh(verts=jnp.asarray([[[0., 0.], [1., 0.], [0., 1.]]]),
                       faces=jnp.asarray([[[0, 1, 2]]]))
        c = BaseMesh.collate([a, tri])
        assert c.batch_size == 2
        assert c.verts_count == 4 and c.faces_count == 2
        np.testing.assert_allclose(np.asarray(c.verts)[1, 3], 0.0)

    def test_trim(self):
        a, b = _square_mesh(), _square_mesh(offset=5.0)
        c = BaseMesh.concat([a, b])
        polygon = jnp.asarray([[[-1., -1.], [2., -1.], [2., 2.], [-1., 2.]]])
        t = c.trim(polygon)
        assert t.faces_count == 2
        assert t.verts_count == 4
        assert float(jnp.max(t.verts)) <= 1.0

    def test_json_roundtrip(self, tmp_path):
        m = _square_mesh()
        p = os.path.join(tmp_path, 'mesh.json')
        m.save(p)
        m2 = BaseMesh.load(p)
        np.testing.assert_allclose(np.asarray(m2.verts), np.asarray(m.verts))
        np.testing.assert_array_equal(np.asarray(m2.faces), np.asarray(m.faces))

    def test_pickle_roundtrip(self, tmp_path):
        m = _square_mesh()
        p = os.path.join(tmp_path, 'mesh.pkl')
        m.pickle(p)
        m2 = BaseMesh.unpickle(p)
        assert isinstance(m2, BaseMesh)
        np.testing.assert_allclose(np.asarray(m2.verts), np.asarray(m.verts))


class TestAttributeMesh:
    def test_set_attr_and_concat(self):
        m = AttributeMesh.set_attr(_square_mesh(), jnp.asarray([1., 0., 0.]))
        assert m.attr_dim == 3
        c = AttributeMesh.concat([m, m])
        assert c.attrs.shape == (1, 8, 3)

    def test_rgb_set_color_range(self):
        m = RGBMesh.set_color(_square_mesh(), (255, 0, 0))
        np.testing.assert_allclose(np.asarray(m.attrs)[0, 0], [1., 0., 0.])

    def test_trim_carries_attrs(self):
        m = AttributeMesh.set_attr(
            BaseMesh.concat([_square_mesh(), _square_mesh(offset=5.0)]),
            jnp.asarray([0.5, 0.5, 0.5]))
        polygon = jnp.asarray([[[-1., -1.], [2., -1.], [2., 2.], [-1., 2.]]])
        t = m.trim(polygon)
        assert t.attrs.shape == (1, 4, 3)


class TestBirdviewMesh:
    def test_set_properties_and_fill(self):
        m = BirdviewMesh.set_properties(_square_mesh(), category='road',
                                        color=(155, 155, 155), z=15.0)
        rgb = m.fill_attr()
        assert isinstance(rgb, RGBMesh)
        assert rgb.verts.shape[-1] == 3  # z appended
        np.testing.assert_allclose(np.asarray(rgb.verts)[0, :, 2], 15.0)
        np.testing.assert_allclose(np.asarray(rgb.attrs)[0, 0], 155 / 255.0, atol=1e-6)

    def test_unify_and_concat(self):
        road = BirdviewMesh.set_properties(_square_mesh(), 'road', (155, 155, 155), 15)
        car = BirdviewMesh.set_properties(_square_mesh(offset=3.0), 'vehicle', (32, 74, 135), 4)
        c = BirdviewMesh.concat([road, car])
        assert set(c.categories) == {'road', 'vehicle'}
        cats = np.asarray(c.vert_category)[0]
        assert len(set(cats.tolist())) == 2
        rgb = c.fill_attr()
        zs = np.asarray(rgb.verts)[0, :, 2]
        assert set(zs.tolist()) == {15.0, 4.0}

    def test_missing_color_raises(self):
        m = BirdviewMesh.set_properties(_square_mesh(), 'mystery')
        with pytest.raises(RuntimeError):
            m.fill_attr()

    def test_separate_by_category(self):
        road = BirdviewMesh.set_properties(_square_mesh(), 'road', (1, 1, 1), 15)
        car = BirdviewMesh.set_properties(_square_mesh(offset=3.0), 'vehicle', (2, 2, 2), 4)
        c = BirdviewMesh.concat([road, car])
        parts = c.separate_by_category()
        assert set(parts.keys()) == {'road', 'vehicle'}
        assert parts['road'].faces_count == 2

    def test_json_roundtrip(self, tmp_path):
        m = BirdviewMesh.set_properties(_square_mesh(), 'road', (155, 155, 155), 15)
        p = os.path.join(tmp_path, 'bv.json')
        m.save(p)
        m2 = BirdviewMesh.load(p)
        assert m2.categories == ['road']
        assert m2.zs == {'road': 15}
        np.testing.assert_allclose(np.asarray(m2.verts), np.asarray(m.verts))

    def test_reference_mesh_json_loads(self):
        # the bundled CARLA map format must load directly
        ref = '/root/reference/torchdrivesim/resources/maps/carla_Town02/carla_Town02_mesh.json'
        if not os.path.exists(ref):
            pytest.skip('reference map assets not present')
        m = BirdviewMesh.load(ref)
        assert m.verts_count > 1000
        assert 'road' in m.categories


def test_generate_disc_mesh():
    verts, faces = generate_disc_mesh(radius=2.0, num_triangles=8)
    assert verts.shape == (9, 2) and faces.shape == (8, 3)
    radii = np.linalg.norm(np.asarray(verts)[1:], axis=-1)
    np.testing.assert_allclose(radii, 2.0, atol=1e-5)
    # area of the fan approximates the disc
    v = np.asarray(verts)
    f = np.asarray(faces)
    area = 0.0
    for tri in f:
        a, b, c = v[tri[0]], v[tri[1]], v[tri[2]]
        area += abs(np.cross(b - a, c - a)) / 2
    assert 0.85 * np.pi * 4 < area <= np.pi * 4


def test_generate_trajectory_mesh():
    pts = jnp.asarray([[[0., 0., 0.], [5., 5., 1.57]]])
    m = generate_trajectory_mesh(pts)
    assert m.verts.shape == (1, 6, 2) and m.faces.shape == (1, 2, 3)


def test_generate_annulus_polygon_mesh():
    poly = jnp.asarray([[0., 0.], [4., 0.], [4., 4.], [0., 4.]])
    m = generate_annulus_polygon_mesh(poly, 1.5, jnp.asarray([2., 2.]), category='map_boundary')
    assert isinstance(m, BirdviewMesh)
    assert m.faces_count == 8


def test_build_verts_faces_from_bounding_box():
    bbs = jnp.zeros((2, 3, 4, 2))
    verts, faces = build_verts_faces_from_bounding_box(bbs)
    assert verts.shape == (2, 12, 2) and faces.shape == (2, 6, 3)
    assert int(faces[0].max()) == 11
