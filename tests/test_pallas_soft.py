"""Parity of the Pallas soft (differentiable) rasterizer against the XLA
softmax-blend reference — values AND gradients, in interpreter mode."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchdrivesim_tpu.ops.pallas_soft import rasterize_softmax_pallas
from torchdrivesim_tpu.ops.rasterize import rasterize_softmax


def _scene(seed, b=2, n_tri=9, res=64, degenerate_last=True):
    rng = np.random.RandomState(seed)
    verts = np.concatenate([
        rng.uniform(-10, res + 10, (b, n_tri * 3, 2)),
        rng.uniform(2, 15, (b, n_tri * 3, 1)),
    ], axis=-1).astype(np.float32)
    for fi in range(n_tri):
        verts[:, fi * 3:(fi + 1) * 3, 2] = verts[:, fi * 3:fi * 3 + 1, 2]
    if degenerate_last:
        # a masked (absent-agent) face: all corners at the origin
        verts[:, -3:, :] = 0.0
    faces = np.tile(np.arange(n_tri * 3, dtype=np.int32).reshape(1, n_tri, 3),
                    (b, 1, 1))
    attrs = np.repeat(rng.uniform(0, 1, (b, n_tri, 1, 3)), 3, axis=2)
    attrs = attrs.reshape(b, n_tri * 3, 3).astype(np.float32)
    bg = rng.uniform(0, 1, (b, res, res, 3)).astype(np.float32)
    return jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(attrs), \
        jnp.asarray(bg)


@pytest.mark.parametrize('seed', [0, 1])
def test_forward_matches_xla(seed):
    res = 64
    verts, faces, attrs, bg = _scene(seed, res=res)
    ref = rasterize_softmax(verts, faces, attrs, res, bg)
    got = rasterize_softmax_pallas(verts, faces, attrs, res, bg,
                                   interpret=True)
    # 5e-4: at pixels where a high-priority face's sigmoid TAIL carries a
    # z-weight ~1e15, the blend is sensitive to last-ulp f32 differences
    # (verified against a float64 oracle); exact match is impossible
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=5e-4)


def test_forward_cams_per_program_batching():
    res = 64
    verts, faces, attrs, bg = _scene(3, b=4, res=res)
    ref = rasterize_softmax_pallas(verts, faces, attrs, res, bg,
                                   interpret=True)
    got = rasterize_softmax_pallas(verts, faces, attrs, res, bg,
                                   cams_per_program=2, interpret=True)
    # not bit-exact: XLA fuses the two block shapes differently (FMA
    # contraction), and z-amplified tails magnify last-ulp differences
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-4)


@pytest.mark.parametrize('seed', [0, 1])
def test_gradients_match_xla(seed):
    """Full-vector gradient parity w.r.t. verts, colors, and background."""
    res = 32
    verts, faces, attrs, bg = _scene(seed, b=1, n_tri=5, res=res)
    weight = jnp.asarray(
        np.random.RandomState(99).uniform(-1, 1, (1, res, res, 3)),
        jnp.float32)

    def loss(raster):
        def f(verts, attrs, bg):
            img = raster(verts, faces, attrs, res, bg)
            return jnp.sum(img * weight)
        return f

    ref_grads = jax.grad(loss(rasterize_softmax), argnums=(0, 1, 2))(
        verts, attrs, bg)
    pal = lambda v, f_, a, r, b_: rasterize_softmax_pallas(
        v, f_, a, r, b_, interpret=True)
    got_grads = jax.grad(loss(pal), argnums=(0, 1, 2))(verts, attrs, bg)
    for name, gr, gg in zip(('verts', 'attrs', 'bg'), ref_grads, got_grads):
        gr, gg = np.asarray(gr), np.asarray(gg)
        scale = np.abs(gr).max() + 1e-8
        np.testing.assert_allclose(gg / scale, gr / scale, atol=2e-5,
                                   err_msg=name)


def test_gradcheck_central_differences():
    """The kernel VJP agrees with central differences on vertex positions."""
    res = 32
    verts, faces, attrs, bg = _scene(7, b=1, n_tri=4, res=res,
                                     degenerate_last=False)
    weight = jnp.asarray(
        np.random.RandomState(5).uniform(-1, 1, (1, res, res, 3)),
        jnp.float32)

    def f(flat):
        v = flat.reshape(verts.shape)
        img = rasterize_softmax_pallas(v, faces, attrs, res, bg,
                                       interpret=True)
        return jnp.sum(img * weight)

    flat = verts.reshape(-1)
    g = np.asarray(jax.grad(f)(flat))
    rng = np.random.RandomState(11)
    idxs = rng.choice(flat.shape[0], 10, replace=False)
    eps = 1e-3
    for i in idxs:
        e = jnp.zeros_like(flat).at[i].set(eps)
        fd = (float(f(flat + e)) - float(f(flat - e))) / (2 * eps)
        assert abs(fd - g[i]) <= 5e-3 * max(1.0, abs(fd), abs(g[i])), \
            f"idx {i}: fd={fd} vjp={g[i]}"


@pytest.mark.parametrize('n_tri,res,b', [(256, 32, 2), (512, 32, 1),
                                         (136, 96, 1), (24, 256, 1)])
def test_grouped_forward_matches_xla(n_tri, res, b):
    """Face counts above MAX_FACES and resolutions above 128 take the
    grouped-accumulator kernels; values must still match the XLA softmax
    reference (VERDICT r3 directive 2 -- reference serves any face count,
    `torchdrivesim/rendering/pytorch3d.py:89-127`)."""
    verts, faces, attrs, bg = _scene(0, b=b, n_tri=n_tri, res=res)
    ref = rasterize_softmax(verts, faces, attrs, res, bg)
    got = rasterize_softmax_pallas(verts, faces, attrs, res, bg,
                                   interpret=True)
    # 2e-3: z-amplified sigmoid tails are last-ulp sensitive (see
    # test_forward_matches_xla), and more faces amplify the worst ratio
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=2e-3)


@pytest.mark.parametrize('n_tri,res,group,atol', [
    # multi-group split + XLA-combine autodiff (small groups keep the
    # interpret-mode backward graph tractable; the group-combine logic is
    # identical at any group size, and the 128-face backward kernel body
    # is pinned by the single-group gradient tests above)
    (40, 32, 16, 5e-5),
    # single-kernel path at a sub-4096-band resolution (more pixels ->
    # larger f32 accumulation differences vs the XLA chunk order)
    (20, 96, None, 1e-3),
    # grouped path with a REAL pixel-band grid dimension in the backward
    # (grow accumulates across bands: res 80 -> rows 50 -> 2 bands of 25;
    # the small forced group size keeps both groups multi-band). 8e-3: the
    # per-band partial sums of gt*px (terms O(res), result O(0.1)) cancel,
    # so the band split's reduction order costs ~eps * res * sqrt(pixels)
    # of the result scale (measured: 1-band err 3.9e-4, 2-band 4.6e-3)
    (12, 80, 8, 8e-3),
])
def test_grouped_gradients_match_xla(n_tri, res, group, atol, monkeypatch):
    """Gradient parity through the grouped/banded paths."""
    if group is not None:
        import torchdrivesim_tpu.ops.pallas_soft as PS
        monkeypatch.setattr(PS, 'MAX_FACES', group)
    verts, faces, attrs, bg = _scene(1, b=1, n_tri=n_tri, res=res)
    weight = jnp.asarray(
        np.random.RandomState(99).uniform(-1, 1, (1, res, res, 3)),
        jnp.float32)

    def loss(raster):
        def f(verts, attrs, bg):
            img = raster(verts, faces, attrs, res, bg)
            return jnp.sum(img * weight)
        return f

    ref_grads = jax.grad(loss(rasterize_softmax), argnums=(0, 1, 2))(
        verts, attrs, bg)
    pal = lambda v, f_, a, r, b_: rasterize_softmax_pallas(
        v, f_, a, r, b_, interpret=True)
    got_grads = jax.grad(loss(pal), argnums=(0, 1, 2))(verts, attrs, bg)
    for name, gr, gg in zip(('verts', 'attrs', 'bg'), ref_grads, got_grads):
        gr, gg = np.asarray(gr), np.asarray(gg)
        scale = np.abs(gr).max() + 1e-8
        np.testing.assert_allclose(gg / scale, gr / scale, atol=atol,
                                   err_msg=name)


def test_empty_faces_returns_background():
    res = 64
    verts = jnp.zeros((2, 0, 3))
    faces = jnp.zeros((2, 0, 3), jnp.int32)
    attrs = jnp.zeros((2, 0, 3))
    bg = jnp.ones((2, res, res, 3)) * 0.4
    out = rasterize_softmax_pallas(verts, faces, attrs, res, bg,
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(out), 0.4)


@pytest.mark.depends_on_tpu
def test_grouped_soft_compiled_matches_reference_on_tpu():
    """The Mosaic-COMPILED grouped kernels (forward + full backward) must
    match the XLA softmax reference on real hardware -- interpret mode
    accepted an SMEM layout the hardware rejects (trailing (3, 3) window
    dims pad to whole tiles, ~1 MB/buffer at 128 faces), so this is the
    check that actually certifies the >128-face path. Runs the
    certification tool in a subprocess with the real TPU backend (the
    pytest session itself is pinned to CPU by conftest)."""
    import json
    import subprocess
    import sys

    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "TDS_PLATFORM")}
    tool = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                        "tools", "certify_soft_grouped.py")
    proc = subprocess.run([sys.executable, tool, "correctness"],
                          capture_output=True, text=True, timeout=1200,
                          env=env)
    assert proc.returncode == 0, proc.stderr[-500:]
    rows = [json.loads(l) for l in proc.stdout.splitlines()
            if l.startswith("{")]
    assert rows and rows[0]["ok"], rows
