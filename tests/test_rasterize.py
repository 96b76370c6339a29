import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchdrivesim_tpu.ops.grids import Grid2D
from torchdrivesim_tpu.ops.rasterize import (
    bake_background_texture, camera_rows_cols, rasterize_hard, rasterize_soft,
    sample_background,
)


def numpy_reference_raster(verts, faces, attrs, res, background):
    """Brute-force per-pixel rasterizer: min-z face covering each pixel."""
    out = np.array(background, copy=True)
    v = np.asarray(verts)
    f = np.asarray(faces)
    a = np.asarray(attrs)
    for b in range(v.shape[0]):
        for row in range(res):
            for col in range(res):
                p = np.array([row + 0.5, col + 0.5])
                best_z = np.inf
                for fi in range(f.shape[1]):
                    tri = v[b, f[b, fi], :2]
                    z = v[b, f[b, fi][0], 2]
                    e = []
                    for k in range(3):
                        p1, p2 = tri[k], tri[(k + 1) % 3]
                        e.append((p2[0] - p1[0]) * (p[1] - p1[1])
                                 - (p2[1] - p1[1]) * (p[0] - p1[0]))
                    area = abs(np.cross(tri[1] - tri[0], tri[2] - tri[0]))
                    inside = (all(x >= 0 for x in e) or all(x <= 0 for x in e)) \
                        and area > 1e-9
                    if inside and z < best_z:
                        best_z = z
                        out[b, row, col] = a[b, f[b, fi][0]]
    return out


def test_hard_matches_numpy_reference():
    rng = np.random.RandomState(0)
    res = 16
    b, n_tri = 2, 5
    verts = np.concatenate([
        rng.uniform(-4, 20, (b, n_tri * 3, 2)),
        rng.uniform(1, 10, (b, n_tri * 3, 1)),
    ], axis=-1).astype(np.float32)
    # same z for all verts of a face (the scene invariant)
    for fi in range(n_tri):
        verts[:, fi * 3:(fi + 1) * 3, 2] = verts[:, fi * 3:fi * 3 + 1, 2]
    faces = np.tile(np.arange(n_tri * 3, dtype=np.int32).reshape(1, n_tri, 3), (b, 1, 1))
    attrs = np.repeat(rng.uniform(0, 1, (b, n_tri, 1, 3)), 3, axis=2).reshape(b, n_tri * 3, 3).astype(np.float32)
    background = np.zeros((b, res, res, 3), np.float32)

    got = np.asarray(rasterize_hard(jnp.asarray(verts), jnp.asarray(faces),
                                    jnp.asarray(attrs), res,
                                    jnp.asarray(background), face_chunk=2))
    want = numpy_reference_raster(verts, faces, attrs, res, background)
    # pixels on exact edges may differ; demand 99% agreement
    agree = np.isclose(got, want, atol=1e-5).all(axis=-1).mean()
    assert agree > 0.99, f"only {agree:.3f} of pixels agree"


def test_z_priority_lower_on_top():
    res = 8
    big = np.asarray([[[-10, -10], [20, -10], [5, 20]]], np.float32)
    verts = np.concatenate([
        np.concatenate([big[0], big[0]], axis=0)[None],
        np.asarray([[[5.], [5.], [5.], [2.], [2.], [2.]]], np.float32),
    ], axis=-1)
    faces = np.asarray([[[0, 1, 2], [3, 4, 5]]], np.int32)
    attrs = np.asarray([[[1, 0, 0]] * 3 + [[0, 1, 0]] * 3], np.float32)
    img = np.asarray(rasterize_hard(jnp.asarray(verts), jnp.asarray(faces),
                                    jnp.asarray(attrs), res,
                                    jnp.zeros((1, res, res, 3))))
    # the z=2 (green) face must win everywhere it covers
    covered = img.sum(-1) > 0
    assert covered.any()
    np.testing.assert_allclose(img[covered], np.tile([0., 1., 0.], (int(covered.sum()), 1)), atol=1e-6)


def test_degenerate_masked_faces_paint_nothing():
    res = 8
    verts = jnp.asarray([[[2., 2., 5.], [6., 2., 5.], [4., 6., 5.]]])
    faces = jnp.asarray([[[0, 0, 0]]], dtype=jnp.int32)  # masked (zeroed) face
    attrs = jnp.ones((1, 3, 3))
    img = np.asarray(rasterize_hard(verts, faces, attrs, res,
                                    jnp.zeros((1, res, res, 3))))
    np.testing.assert_allclose(img, 0.0)


def test_soft_approximates_hard_in_interior():
    res = 32
    verts = jnp.asarray([[[4., 4., 5.], [28., 4., 5.], [16., 28., 5.]]])
    faces = jnp.asarray([[[0, 1, 2]]], dtype=jnp.int32)
    attrs = jnp.ones((1, 3, 3)) * jnp.asarray([1.0, 0.5, 0.0])
    bg = jnp.zeros((1, res, res, 3))
    hard = np.asarray(rasterize_hard(verts, faces, attrs, res, bg))
    soft = np.asarray(rasterize_soft(verts, faces, attrs, res, bg, sigma=0.3))
    interior = hard[..., 0] == 1.0
    diff = np.abs(hard - soft)[interior]
    assert np.median(diff) < 0.05


def test_softmax_blend_matches_hard_in_interior():
    from torchdrivesim_tpu.ops.rasterize import rasterize_softmax
    res = 32
    # two overlapping faces with different z: lower z must dominate
    verts = jnp.asarray([[[4., 4., 4.], [28., 4., 4.], [16., 28., 4.],
                          [4., 4., 10.], [28., 4., 10.], [16., 28., 10.]]])
    faces = jnp.asarray([[[0, 1, 2], [3, 4, 5]]], dtype=jnp.int32)
    attrs = jnp.concatenate([
        jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (1, 3, 3)),
        jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (1, 3, 3)),
    ], axis=1)
    bg = jnp.zeros((1, res, res, 3))
    hard = np.asarray(rasterize_hard(verts, faces, attrs, res, bg))
    soft = np.asarray(rasterize_softmax(verts, faces, attrs, res, bg,
                                        sigma=0.3))
    interior = hard[..., 0] == 1.0
    assert interior.any()
    diff = np.abs(hard - soft)[interior]
    assert np.median(diff) < 0.05
    # uncovered pixels stay background
    np.testing.assert_allclose(soft[0, 0, 0], 0.0, atol=1e-3)


def test_softmax_blend_gradient():
    from torchdrivesim_tpu.ops.rasterize import rasterize_softmax
    res = 16
    faces = jnp.asarray([[[0, 1, 2]]], dtype=jnp.int32)
    attrs = jnp.ones((1, 3, 3))
    bg = jnp.zeros((1, res, res, 3))

    def brightness(shift):
        verts = jnp.asarray([[[4., 4., 5.], [12., 4., 5.], [8., 12., 5.]]])
        verts = verts.at[..., 0].add(shift)
        return jnp.sum(rasterize_softmax(verts, faces, attrs, res, bg))

    g = jax.grad(brightness)(jnp.asarray(0.0))
    assert np.isfinite(float(g))
    eps = 1e-2
    fd = (brightness(jnp.asarray(eps)) - brightness(jnp.asarray(-eps))) / (2 * eps)
    np.testing.assert_allclose(float(g), float(fd), rtol=0.05, atol=1e-3)


def test_soft_gradient_flows_to_vertices():
    res = 16
    faces = jnp.asarray([[[0, 1, 2]]], dtype=jnp.int32)
    attrs = jnp.ones((1, 3, 3))
    bg = jnp.zeros((1, res, res, 3))

    def brightness(shift):
        verts = jnp.asarray([[[4., 4., 5.], [12., 4., 5.], [8., 12., 5.]]])
        verts = verts.at[..., 0].add(shift)
        return jnp.sum(rasterize_soft(verts, faces, attrs, res, bg))

    g = jax.grad(brightness)(jnp.asarray(0.0))
    assert np.isfinite(float(g))
    eps = 1e-2
    fd = (brightness(jnp.asarray(eps)) - brightness(jnp.asarray(-eps))) / (2 * eps)
    np.testing.assert_allclose(float(g), float(fd), rtol=0.05, atol=1e-3)


def test_camera_rows_cols_orientation():
    # camera at origin facing +x: a point ahead must land in the upper half
    cam_xy = jnp.zeros((1, 2))
    cam_sc = jnp.asarray([[0.0, 1.0]])  # sin=0, cos=1 -> psi=0
    res = 64
    scale = 2.0 / 35
    ahead = jnp.asarray([[[10.0, 0.0]]])
    rc = np.asarray(camera_rows_cols(ahead, cam_xy, cam_sc, scale, res))[0, 0]
    assert rc[0] < res / 2  # smaller row = up
    np.testing.assert_allclose(rc[1], res / 2, atol=1e-5)
    left = jnp.asarray([[[0.0, 10.0]]])
    rc_left = np.asarray(camera_rows_cols(left, cam_xy, cam_sc, scale, res))[0, 0]
    assert rc_left[1] < res / 2  # left of agent = left in image
    # left-handed flips columns
    rc_lh = np.asarray(camera_rows_cols(left, cam_xy, cam_sc, scale, res,
                                        left_handed=True))[0, 0]
    assert rc_lh[1] > res / 2


def test_bake_and_sample_roundtrip():
    # a red 10x10 square at the origin on a gray background
    verts = jnp.asarray([[0., 0., 5.], [10., 0., 5.], [10., 10., 5.], [0., 10., 5.]])
    faces = jnp.asarray([[0, 1, 2], [0, 2, 3]], dtype=jnp.int32)
    attrs = jnp.ones((4, 3)) * jnp.asarray([1.0, 0.0, 0.0])
    texture = bake_background_texture(verts, faces, attrs,
                                      background_color=jnp.asarray([0.2, 0.2, 0.2]),
                                      pixels_per_meter=4.0, margin=8.0)
    assert texture.data.ndim == 3
    # camera centered on the square, facing +x, fov 20 m
    cam_xy = jnp.asarray([[5.0, 5.0]])
    cam_sc = jnp.asarray([[0.0, 1.0]])
    img = np.asarray(sample_background(texture, cam_xy, cam_sc, 2.0 / 20, 32,
                                       jnp.asarray([0., 0., 0.])))
    # center pixel is on the square -> red
    np.testing.assert_allclose(img[0, 16, 16], [1.0, 0.0, 0.0], atol=0.05)
    # corner of the image is off the square (distance > 7m) -> gray
    np.testing.assert_allclose(img[0, 0, 0], [0.2, 0.2, 0.2], atol=0.05)
    # forward direction: the square spans x in [0,10]; pixels looking ahead
    # (row 0 = x=15) are off the square
    assert img[0, 0, 16, 0] < 0.9


def test_sample_background_gradient_wrt_camera():
    verts = jnp.asarray([[0., 0., 5.], [10., 0., 5.], [10., 10., 5.], [0., 10., 5.]])
    faces = jnp.asarray([[0, 1, 2], [0, 2, 3]], dtype=jnp.int32)
    attrs = jnp.ones((4, 3))
    # coarse texture cells (2 m) so several image sample points fall inside
    # the bilinear transition band at the square's edge -- with fine cells
    # the gradient is zero almost everywhere (legitimate aliasing)
    texture = bake_background_texture(verts, faces, attrs,
                                      background_color=jnp.zeros(3),
                                      pixels_per_meter=0.5, margin=8.0)

    def f(x):
        cam_xy = jnp.stack([x, jnp.asarray(5.0)])[None]
        cam_sc = jnp.asarray([[0.0, 1.0]])
        img = sample_background(texture, cam_xy, cam_sc, 2.0 / 20, 32,
                                jnp.zeros(3))
        return jnp.mean(img)

    g = jax.grad(f)(jnp.asarray(12.0))
    assert np.isfinite(float(g)) and abs(float(g)) > 1e-4
    eps = 0.05
    fd = (f(jnp.asarray(12.0 + eps)) - f(jnp.asarray(12.0 - eps))) / (2 * eps)
    np.testing.assert_allclose(float(g), float(fd), rtol=0.2)


def test_sample_background_quad_matches_bilinear():
    from torchdrivesim_tpu.ops.rasterize import (
        pack_texture_rgb8_quad, sample_background_quad)
    rng = np.random.RandomState(3)
    # RGB8-representable texture so the quad pack is exact
    data = rng.randint(0, 256, (40, 48, 3)).astype(np.float32) / 255.0
    texture = Grid2D(data=jnp.asarray(data),
                     origin=jnp.asarray([-10.0, -8.0]), cell_size=0.5)
    quad = pack_texture_rgb8_quad(texture)
    cam_xy = jnp.asarray([[2.0, 1.0], [-3.0, 0.5]])
    ang = jnp.asarray([0.3, -1.1])
    cam_sc = jnp.stack([jnp.sin(ang), jnp.cos(ang)], -1)
    # fov small enough that every sampled quad is interior
    ref = sample_background(texture, cam_xy, cam_sc, 2.0 / 8, 32,
                            jnp.asarray([0.1, 0.2, 0.3]))
    got = sample_background_quad(quad, cam_xy, cam_sc, 2.0 / 8, 32,
                                 jnp.asarray([0.1, 0.2, 0.3]))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_sample_background_quad_gradient_matches_bilinear():
    from torchdrivesim_tpu.ops.rasterize import (
        pack_texture_rgb8_quad, sample_background_quad)
    rng = np.random.RandomState(7)
    data = rng.randint(0, 256, (64, 64, 3)).astype(np.float32) / 255.0
    texture = Grid2D(data=jnp.asarray(data),
                     origin=jnp.asarray([-16.0, -16.0]), cell_size=0.5)
    quad = pack_texture_rgb8_quad(texture)

    def make_f(sampler, tex):
        def f(pose):
            cam_xy = pose[:2][None]
            cam_sc = jnp.stack([jnp.sin(pose[2]), jnp.cos(pose[2])])[None]
            img = sampler(tex, cam_xy, cam_sc, 2.0 / 8, 16, jnp.zeros(3))
            return jnp.mean(img * jnp.linspace(0, 1, 16)[None, :, None, None])
        return f

    pose = jnp.asarray([1.5, -0.7, 0.4])
    g_ref = jax.grad(make_f(sample_background, texture))(pose)
    g_quad = jax.grad(make_f(sample_background_quad, quad))(pose)
    np.testing.assert_allclose(np.asarray(g_quad), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-7)


# ---------------------------------------------------------------------------
# Gradient certification through rendering (BASELINE config 4 contract):
# full-vector central-difference gradchecks, then jax.grad through a 40-step
# dynamics + soft-render rollout vs a directional finite difference.
# Divergence from the reference's pytorch3d soft blend is documented in
# docs/design.md (exact cross-framework match is infeasible; numeric
# self-consistency here is the certified property).
# ---------------------------------------------------------------------------

def _gradcheck_scene():
    rng = np.random.RandomState(7)
    res = 24
    nf = 3
    verts = np.zeros((1, nf * 3, 3), np.float32)
    # well-conditioned triangles at distinct z levels, fully on screen
    verts[0, :, :2] = np.asarray([
        [5, 5], [17, 6], [9, 16],
        [8, 10], [20, 9], [14, 20],
        [4, 14], [13, 12], [7, 22],
    ])
    verts[0, :, 2] = np.repeat([5.0, 7.0, 9.0], 3)
    faces = jnp.asarray(np.arange(9, dtype=np.int32).reshape(1, nf, 3))
    attrs = jnp.asarray(rng.uniform(0.2, 1.0, (1, 9, 3)), jnp.float32)
    bg = jnp.asarray(rng.uniform(0, 0.3, (1, res, res, 3)), jnp.float32)
    # fixed random pixel weights exercise every pixel's gradient path
    w = jnp.asarray(rng.uniform(0.5, 1.5, (1, res, res, 3)), jnp.float32)
    return res, jnp.asarray(verts), faces, attrs, bg, w


def _central_diff(f, x, eps):
    x = np.asarray(x, np.float64)
    g = np.zeros_like(x)
    it = np.nditer(x, flags=['multi_index'])
    while not it.finished:
        i = it.multi_index
        xp = x.copy(); xp[i] += eps
        xm = x.copy(); xm[i] -= eps
        g[i] = (f(jnp.asarray(xp, jnp.float32))
                - f(jnp.asarray(xm, jnp.float32))) / (2 * eps)
        it.iternext()
    return g


@pytest.mark.parametrize('mode', ['softmax', 'painter'])
def test_soft_raster_gradcheck_all_vertex_coords(mode):
    """jax.grad w.r.t. EVERY vertex x/y coordinate vs central differences
    (sigma=0.5, the config the IL example trains with)."""
    from torchdrivesim_tpu.ops.rasterize import rasterize_soft, rasterize_softmax
    res, verts, faces, attrs, bg, w = _gradcheck_scene()
    raster = rasterize_softmax if mode == 'softmax' else rasterize_soft

    def loss(xy):
        v = jnp.concatenate([xy, verts[..., 2:3]], axis=-1)
        return jnp.sum(w * raster(v, faces, attrs, res, bg, sigma=0.5))

    xy0 = verts[..., :2]
    g = np.asarray(jax.grad(loss)(xy0), np.float64)
    fd = _central_diff(loss, xy0, eps=0.05)
    # certified bound: max abs error <= 2% of the gradient scale
    scale = np.abs(fd).max()
    err = np.abs(g - fd).max()
    assert scale > 0.1  # the check is not vacuous
    assert err <= 0.02 * scale, f"gradcheck failed: err {err:.4f} scale {scale:.4f}"


def test_softmax_gradcheck_camera_pose():
    """Gradients w.r.t. camera position AND heading through the full
    world -> screen -> soft-raster chain."""
    from torchdrivesim_tpu.ops.rasterize import camera_rows_cols, rasterize_softmax
    res, verts, faces, attrs, bg, w = _gradcheck_scene()
    # reinterpret the vertex screen coords as world meters
    world_xy = verts[..., :2] * 0.5

    def loss(pose):
        cam_xy = pose[:2][None]
        cam_sc = jnp.stack([jnp.sin(pose[2]), jnp.cos(pose[2])])[None]
        rc = camera_rows_cols(world_xy, cam_xy, cam_sc, 2.0 / 16, res)
        v = jnp.concatenate([rc, verts[..., 2:3]], axis=-1)
        return jnp.sum(w * rasterize_softmax(v, faces, attrs, res, bg,
                                             sigma=0.5))

    pose0 = jnp.asarray([5.0, 6.0, 0.3])
    g = np.asarray(jax.grad(loss)(pose0), np.float64)
    fd = _central_diff(loss, pose0, eps=2e-3)
    scale = np.abs(fd).max()
    assert scale > 0.1
    np.testing.assert_allclose(g, fd, rtol=0.03, atol=0.02 * scale)


def test_il_40step_rollout_gradcheck():
    """The BASELINE config-4 contract: jax.grad of a policy loss through a
    40-step scan of dynamics + soft BEV render agrees with a directional
    finite difference of the same compiled loss."""
    from tests.test_simulator import _build_simulator
    from torchdrivesim_tpu.ops.rasterize import camera_rows_cols, rasterize_softmax

    sim = _build_simulator()
    gen = sim.birdview_mesh_generator
    res, horizon = 32, 40
    b = sim.batch_size
    a = sim.agent_count
    rng = np.random.RandomState(3)
    # linear policy on downsampled image features -> (accel, steer)
    p0 = jnp.asarray(rng.uniform(-0.05, 0.05, (3 * 8 * 8 + 1, 2)), jnp.float32)

    def render_ego(state):
        all_state = jnp.concatenate([state.agent_state, state.npc_state], -2)
        present = jnp.concatenate([state.present_mask,
                                   state.npc_present_mask], -1)
        corners, z, colors = gen.generate_faces(all_state, present_mask=present)
        ego = state.agent_state[:, 0]
        cam_xy = ego[:, :2]
        cam_sc = jnp.stack([jnp.sin(ego[:, 2]), jnp.cos(ego[:, 2])], -1)
        f = corners.shape[1]
        rc = camera_rows_cols(corners.reshape(b, f * 3, 2), cam_xy, cam_sc,
                              2.0 / 40, res).reshape(b, f, 3, 2)
        verts = jnp.concatenate(
            [rc.reshape(b, f * 3, 2),
             jnp.repeat(z[..., None], 3, axis=1).reshape(b, f * 3, 1)], -1)
        faces = jnp.broadcast_to(
            jnp.arange(f * 3, dtype=jnp.int32).reshape(1, f, 3), (b, f, 3))
        attrs = jnp.repeat(colors[:, :, None], 3, axis=2).reshape(b, f * 3, 3)
        bg = jnp.zeros((b, res, res, 3))
        img = rasterize_softmax(verts, faces, attrs, res, bg, sigma=0.5)
        # 8x8 average-pooled features
        pooled = img.reshape(b, 8, 4, 8, 4, 3).mean(axis=(2, 4))
        return pooled.reshape(b, -1)

    def loss_fn(params):
        def body(s, _):
            feat = render_ego(s)
            feat = jnp.concatenate([feat, jnp.ones((b, 1))], -1)
            act_ego = jnp.tanh(feat @ params)              # (B, 2)
            action = jnp.zeros((b, a, 2)).at[:, 0].set(act_ego)
            s = sim.functional_step(s, action)
            return s, None
        final, _ = jax.lax.scan(body, sim.state, None, length=horizon)
        target = jnp.asarray([30.0, 1.0])
        return jnp.mean((final.agent_state[:, 0, :2] - target) ** 2)

    loss_jit = jax.jit(loss_fn)
    g = jax.jit(jax.grad(loss_fn))(p0)
    gn = np.asarray(g, np.float64)
    assert np.isfinite(gn).all() and np.abs(gn).max() > 0

    u = rng.uniform(-1, 1, p0.shape).astype(np.float32)
    u /= np.linalg.norm(u)
    eps = 2e-3
    lp = float(loss_jit(p0 + eps * jnp.asarray(u)))
    lm = float(loss_jit(p0 - eps * jnp.asarray(u)))
    fd = (lp - lm) / (2 * eps)
    dd = float(np.sum(gn * u))
    np.testing.assert_allclose(dd, fd, rtol=0.05, atol=1e-4)


def test_sorted_masks_match_exact_band_chunk_masks():
    """sort_prims_rowmajor_with_masks' matmul-built occupancy must equal
    prim_band_chunk_masks (the exact per-prim formulation) on the SORTED
    prims, for counts below and above the cap."""
    from torchdrivesim_tpu.ops.rasterize import (
        prim_band_chunk_masks, sort_prims_rowmajor_with_masks)
    rng = np.random.RandomState(11)
    res, n_bands, cap = 128, 4, 16
    for n in (5, 12, 40):
        base = rng.uniform(-40, 168, (3, n, 1, 2)).astype(np.float32)
        quad = rng.uniform(2, 12, (3, n, 4, 2)).astype(np.float32)
        corners = jnp.asarray(base + quad)
        z = jnp.asarray(rng.uniform(0, 15, (3, n)).astype(np.float32))
        color = jnp.asarray(rng.uniform(0, 1, (3, n, 3)).astype(np.float32))
        sc, sz, scol, mask = sort_prims_rowmajor_with_masks(
            corners, z, color, res, cap, n_bands)
        want = prim_band_chunk_masks(sc, res, n_bands)
        np.testing.assert_array_equal(np.asarray(mask), np.asarray(want))
