"""Hardware compile-check matrix for every Pallas render path.

The round-5 SMEM lesson (docs/design.md 3d): interpret mode validates
kernel math, not layouts — the grouped soft kernel crashed on the real
chip for two rounds while the CPU suite stayed green. This tool compiles
and executes ONE tiny batch through the renderer for every supported
(resolution, mode, face-count) cell on the real TPU, so layout-level
Mosaic rejects surface immediately instead of in production.

Each cell renders batch 4 with a synthetic face set over a bg-color
background (no map assets needed) and checks the output is finite.
Prints one JSON line per cell; exits nonzero if any cell fails.

Usage (TPU): python tools/certify_compile_matrix.py [fast] [res,res,...]
  fast: skip the >128 tiled resolutions (slowest compiles).
  res list: run only those resolutions (for chunked runs over the tunnel).
"""
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/tds_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from torchdrivesim_tpu.mesh import RGBMesh
from torchdrivesim_tpu.rendering import JaxRendererConfig, renderer_from_config
from torchdrivesim_tpu.utils import Resolution


def scene(n_faces, b=4, extent=15.0, seed=0):
    """n_faces random triangles around the origin, z in [2, 15]."""
    rng = np.random.RandomState(seed)
    verts = np.concatenate([
        rng.uniform(-extent, extent, (b, n_faces * 3, 2)),
        rng.uniform(2, 15, (b, n_faces * 3, 1)),
    ], axis=-1).astype(np.float32)
    faces = np.tile(np.arange(n_faces * 3, dtype=np.int32)
                    .reshape(1, n_faces, 3), (b, 1, 1))
    attrs = rng.uniform(0, 1, (b, n_faces * 3, 3)).astype(np.float32)
    return RGBMesh(verts=jnp.asarray(verts), faces=jnp.asarray(faces),
                   attrs=jnp.asarray(attrs))


def cell(res, differentiable, n_faces):
    cfg = JaxRendererConfig(use_pallas=True, differentiable=differentiable)
    renderer = renderer_from_config(cfg, res=Resolution(res, res), fov=35)
    mesh = scene(n_faces)
    cam_xy = jnp.asarray(np.random.RandomState(1).uniform(-2, 2, (4, 2)),
                         jnp.float32)
    th = np.random.RandomState(2).uniform(0, 6.28, 4).astype(np.float32)
    cam_sc = jnp.stack([jnp.asarray(np.sin(th)), jnp.asarray(np.cos(th))],
                       axis=-1)
    t0 = time.perf_counter()
    img = renderer.render_frame(mesh, cam_xy, cam_sc)
    arr = np.asarray(img)
    dt = time.perf_counter() - t0
    assert arr.shape == (4, 3, res, res), arr.shape
    assert np.isfinite(arr).all()
    if differentiable:
        # one backward through the same path (custom-VJP kernels compile
        # their backward kernels only when differentiated)
        g = jax.grad(lambda cxy: jnp.sum(
            renderer.render_frame(mesh, cxy, cam_sc)))(cam_xy)
        ga = np.asarray(g)
        assert np.isfinite(ga).all()
    return dt


def main():
    args = [a for a in sys.argv[1:] if a != 'fast']
    fast = 'fast' in sys.argv[1:]
    from torchdrivesim_tpu.benchmark import sync_pin
    sync_pin()
    if args:
        resolutions = [int(r) for r in args[0].split(',')]
    else:
        resolutions = [16, 32, 48, 64, 80, 96, 100, 112, 128]
        if not fast:
            resolutions += [256]
    failures = 0
    for res in resolutions:
        for diff in (False, True):
            for n_faces in (12, 200):
                if diff and n_faces == 200 and res > 128:
                    continue           # tiled diff >128: XLA fallback, slow
                try:
                    dt = cell(res, diff, n_faces)
                    row = {"res": res, "diff": diff, "faces": n_faces,
                           "ok": True, "first_call_s": round(dt, 1)}
                except Exception as e:
                    failures += 1
                    row = {"res": res, "diff": diff, "faces": n_faces,
                           "ok": False,
                           "error": traceback.format_exc(limit=1)[-300:]
                           if not str(e) else str(e)[:300]}
                print(json.dumps(row), flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
