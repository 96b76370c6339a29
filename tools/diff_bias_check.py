"""
Quantify the diff-fast background's pose-gradient bias on a REAL map
texture (VERDICT r3 directive 4).

``warp_background_diff`` estimates texture gradients from image-space
central differences of its nearest-mip forward output; the exact reference
is the quad-packed bilinear sampler ``sample_background_quad``, whose
position derivative is the analytic bilinear difference at full texture
resolution. Real town textures are piecewise-constant with hard road
edges, where the two estimators can disagree. This script measures the
disagreement of the POSE gradient (cam_xy, cam_sc) across many camera
poses on the baked Town02 texture, printing per-pose cosine similarity
and relative magnitude so docs/design.md can carry the measured bound.

Run on CPU (interpret mode): TDS_PLATFORM=cpu python tools/diff_bias_check.py
"""
import os
import sys

os.environ.setdefault('TDS_PLATFORM', 'cpu')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np


def main(n_poses: int = 16, res: int = 64, fov: float = 70.0):
    import torchdrivesim_tpu.ops.pallas_warp as PW
    from torchdrivesim_tpu.benchmark import load_or_bake_texture
    from torchdrivesim_tpu.map import find_map_config
    from torchdrivesim_tpu.ops.rasterize import (
        pack_texture_rgb8_quad, sample_background_quad)
    from torchdrivesim_tpu.rendering.base import (
        get_default_color_map, get_default_rendering_levels)

    PW.pl.pallas_call = functools.partial(PW.pl.pallas_call, interpret=True)

    cfg = find_map_config('carla_Town02')
    texture = load_or_bake_texture(cfg, get_default_color_map(),
                                   get_default_rendering_levels())
    quad = pack_texture_rgb8_quad(texture)
    pyramid = PW.build_mip_pyramid(texture)
    scale = 2.0 / fov
    mip = PW.select_mip(pyramid, fov=fov, res=res)
    print(f"texture cell {texture.cell_size}, mip cell {mip.cell_size}")

    # a float Grid2D of the SAME mip level: separates estimator error
    # (central differences of the nearest-filtered forward) from the mip
    # blur, which the forward shares with the production hard path
    from torchdrivesim_tpu.ops.grids import Grid2D
    packed = np.asarray(mip.data[..., 0])
    vh, vw = mip.valid_shape or packed.shape
    mip_float = Grid2D(
        data=np.stack([(packed >> s) & 255 for s in (0, 8, 16)],
                      axis=-1)[:vh, :vw].astype(np.float32) / 255.0,
        origin=np.asarray(mip.origin, np.float32),
        cell_size=float(mip.cell_size))
    from torchdrivesim_tpu.ops.rasterize import sample_background

    bg = jnp.asarray([0.1, 0.2, 0.3], jnp.float32)
    rng = np.random.RandomState(0)
    # poses over the drivable area of Town02 (~x in [0, 200], y in [100, 330])
    xs = rng.uniform(20, 180, n_poses)
    ys = rng.uniform(110, 300, n_poses)
    psis = rng.uniform(-np.pi, np.pi, n_poses)
    if os.environ.get('BIAS_SMOOTH'):
        # training-like cotangent: a CNN loss backpropagates SMOOTH pixel
        # weights, not per-pixel noise (which probes texel-scale structure
        # the mip-level forward genuinely lacks)
        r = np.arange(res) / res
        w = (np.sin(2 * np.pi * 2 * r)[:, None]
             * np.cos(2 * np.pi * 1.5 * r)[None, :]
             + 0.3 * np.sin(2 * np.pi * 3 * r)[None, :])
        weight = jnp.asarray(
            np.stack([w, 0.7 * w + 0.3, -0.5 * w])[None], jnp.float32)
        print("smooth (training-like) cotangent weights")
    else:
        weight = jnp.asarray(rng.uniform(-1, 1, (1, 3, res, res)),
                             jnp.float32)

    def loss_warp(cxy, csc):
        img = PW.warp_background_diff(mip, cxy, csc, scale, bg, res=res)
        return jnp.sum(img * weight)

    def loss_exact(cxy, csc):
        img = sample_background_quad(quad, cxy, csc, scale, res, bg)
        img = jnp.transpose(img, (0, 3, 1, 2))
        return jnp.sum(img * weight)

    def loss_miplinear(cxy, csc):
        img = sample_background(mip_float, cxy, csc, scale, res, bg)
        img = jnp.transpose(img, (0, 3, 1, 2))
        return jnp.sum(img * weight)

    g_warp = jax.jit(jax.grad(loss_warp, argnums=(0, 1)))
    g_exact = jax.jit(jax.grad(loss_exact, argnums=(0, 1)))
    g_mip = jax.jit(jax.grad(loss_miplinear, argnums=(0, 1)))

    stats = {'exact': ([], []), 'mip-bilinear': ([], [])}
    cat = {'exact': ([], []), 'mip-bilinear': ([], [])}
    for i in range(n_poses):
        cxy = jnp.asarray([[xs[i], ys[i]]], jnp.float32)
        csc = jnp.asarray([[np.sin(psis[i]), np.cos(psis[i])]], jnp.float32)
        gw = np.concatenate([np.asarray(t).ravel() for t in g_warp(cxy, csc)])
        line = f"pose {i:2d} (x={xs[i]:6.1f} y={ys[i]:6.1f} psi={psis[i]:+5.2f}):"
        for name, fn in (('exact', g_exact), ('mip-bilinear', g_mip)):
            ge = np.concatenate([np.asarray(t).ravel() for t in fn(cxy, csc)])
            nw, ne = np.linalg.norm(gw), np.linalg.norm(ge)
            cos = float(gw @ ge / (nw * ne + 1e-12))
            rel = float(nw / (ne + 1e-12))
            stats[name][0].append(cos)
            stats[name][1].append(rel)
            cat[name][0].append(gw)
            cat[name][1].append(ge)
            line += (f"  [{name}] cos={cos:+.3f} ratio={rel:.3f} "
                     f"|g|={ne:.3g}")
        print(line)
    for name, (cos_all, rel_all) in stats.items():
        gw_all = np.concatenate(cat[name][0])
        ge_all = np.concatenate(cat[name][1])
        pooled = float(gw_all @ ge_all
                       / (np.linalg.norm(gw_all) * np.linalg.norm(ge_all)
                          + 1e-12))
        relerr = float(np.linalg.norm(gw_all - ge_all)
                       / (np.linalg.norm(ge_all) + 1e-12))
        print(f"\nvs {name}: cos min={min(cos_all):.4f} "
              f"mean={np.mean(cos_all):.4f} POOLED={pooled:.4f}; ratio "
              f"min={min(rel_all):.3f} max={max(rel_all):.3f} "
              f"mean={np.mean(rel_all):.3f}; pooled relerr={relerr:.3f}")


if __name__ == '__main__':
    main()
