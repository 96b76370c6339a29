"""Bisect the fused kernel's warp+composite cost (~0.63 ms/step at B=256
over the gen_nowarp floor; see tools/ablate_banded.py) into its parts:
window DMA, pass-1 gather, mid transpose, pass-2 gather, final transpose,
validity mask, and the float-unpack composite.

Each variant is the STANDALONE warp kernel with one stage altered (wrong
pixels are fine -- timing only), run inside a jitted scan like the real
step so dispatch overhead cancels in deltas. Packed int32 output unless the
variant name says 'float' (isolates output-write traffic from compute).

Usage: python tools/probe_warp_parts.py [variant ...]
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/tds_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from torchdrivesim_tpu.benchmark import build_benchmark_scenario, sync_pin
from torchdrivesim_tpu.ops.pallas_warp import (
    RES, WIN_ROWS, WINDOW, _gather_lanes, select_mip, start_window_dma,
    warp_coefficients,
)

B = int(os.environ.get('PW_BATCH', 256))
#: 1000-step scans cut the per-fetch tunnel overhead to ~0.006 ms/step
#: (the 50-step default carried ~0.6 ms/step and made deltas unusable)
STEPS = int(os.environ.get('PW_STEPS', 1000))
CAMS = 4


def _variant_view(fcoef_ref, icoef_ref, c, window_ref, dma, tmp_ref,
                  out_tmp_ref, mode):
    """warp_view_packed with one stage altered per ``mode``."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (RES, RES), 0).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (RES, RES), 1).astype(jnp.float32)
    flip = icoef_ref[c, 0, 2]
    bg_packed = icoef_ref[c, 0, 3]
    f = lambda k: fcoef_ref[c, 0, k]
    va, vb, vc = f(0), f(1), f(2)
    ha, hb, hc = f(3), f(4), f(5)
    ty_a, ty_b, ty_c = f(6), f(7), f(8)
    tx_a, tx_b, tx_c = f(9), f(10), f(11)
    h_tex, w_tex = f(12), f(13)

    def h_idx_on(shape, bound):
        rr = jax.lax.broadcasted_iota(jnp.int32, shape, 0).astype(jnp.float32)
        cc = jax.lax.broadcasted_iota(jnp.int32, shape, 1).astype(jnp.float32)
        h = jnp.floor(ha * rr + hb * cc + hc + 0.5).astype(jnp.int32)
        return jnp.clip(h, 0, bound - 1)

    v_idx_t = jnp.floor(va * cols + vb * rows + vc + 0.5).astype(jnp.int32)
    ty = ty_a * rows + ty_b * cols + ty_c
    tx = tx_a * rows + tx_b * cols + tx_c
    valid = (ty >= 0) & (ty < h_tex) & (tx >= 0) & (tx < w_tex)

    if dma is not None:
        dma.wait()

    if mode == 'dmaonly':
        return window_ref[:, :RES]

    if mode == 'nopass1':
        tmp_ref[0:WIN_ROWS, :] = window_ref[:, :RES]
    else:
        tmp_ref[0:WIN_ROWS, :] = _gather_lanes(
            window_ref[:, :], h_idx_on((WIN_ROWS, RES), WINDOW))
    if mode == 'pass1only':
        return tmp_ref[0:WIN_ROWS, :]

    if mode == 'subgather':
        # pass 2 as ONE sublane-directed gather: midT + lane-gather +
        # finalT == take_along_axis(tmp, v, axis=0); if Mosaic lowers this
        # well it deletes both (128,128) transposes (~0.087 ms/step)
        v_idx = jnp.floor(va * rows + vb * cols + vc + 0.5).astype(jnp.int32)
        packed = jnp.take_along_axis(
            tmp_ref[0:WIN_ROWS, :], jnp.clip(v_idx, 0, WIN_ROWS - 1), axis=0)
        return jnp.where(valid, packed, bg_packed)

    if mode == 'nomidT':
        table = tmp_ref[0:WIN_ROWS, :]        # WRONG pixels; timing only
    elif mode == 'mxuT':
        eye = (jax.lax.broadcasted_iota(jnp.int32, (RES, RES), 0)
               == jax.lax.broadcasted_iota(jnp.int32, (RES, RES), 1)
               ).astype(jnp.float32)
        table = jax.lax.dot_general(
            tmp_ref[0:WIN_ROWS, :].astype(jnp.float32), eye,
            (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST).astype(jnp.int32)
    else:
        table = tmp_ref[0:WIN_ROWS, :].T
    if mode == 'nopass2':
        out_tmp_ref[:, :] = table
    else:
        out_tmp_ref[:, :] = _gather_lanes(
            table, jnp.clip(v_idx_t, 0, WIN_ROWS - 1))

    if mode == 'nofinalT':
        packed = out_tmp_ref[:, :]            # WRONG pixels; timing only
    elif mode == 'mxuT':
        eye = (jax.lax.broadcasted_iota(jnp.int32, (RES, RES), 0)
               == jax.lax.broadcasted_iota(jnp.int32, (RES, RES), 1)
               ).astype(jnp.float32)
        packed = jax.lax.dot_general(
            out_tmp_ref[:, :].astype(jnp.float32), eye,
            (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST).astype(jnp.int32)
    else:
        packed = out_tmp_ref[:, :].T
    if mode == 'novalid':
        return packed
    return jnp.where(valid, packed, bg_packed)


def _probe_kernel(fcoef_ref, icoef_ref, tex_ref, out_ref, win_ref, sem,
                  tmp_ref, out_tmp_ref, *, cams, mode, float_out):
    dmas = [start_window_dma(icoef_ref, c, tex_ref, win_ref.at[c], sem.at[c])
            for c in range(cams)]

    def emit(c, packed):
        if float_out:
            inv255 = 1.0 / 255.0
            out_ref[c, 0] = (packed & 0xFF).astype(jnp.float32) * inv255
            out_ref[c, 1] = ((packed >> 8) & 0xFF).astype(jnp.float32) * inv255
            out_ref[c, 2] = ((packed >> 16) & 0xFF).astype(jnp.float32) * inv255
        else:
            out_ref[c] = packed

    if mode == 'privscratch':
        # per-camera scratch: breaks the cross-camera serialization on the
        # shared tmp/out_tmp buffers so stages of different cameras can
        # pipeline (tmp_ref/out_tmp_ref here carry a leading cams dim)
        for c in range(cams):
            packed = _variant_view(fcoef_ref, icoef_ref, c, win_ref.at[c],
                                   dmas[c], tmp_ref.at[c], out_tmp_ref.at[c],
                                   'full')
            emit(c, packed)
        return

    if mode == 'stagemajor':
        # private scratch AND stage-major order: all pass-1s, then all
        # pass-2s, then all composites -- maximal independent work between
        # dependent instructions
        f = lambda k, c: fcoef_ref[c, 0, k]
        for c in range(cams):
            dmas[c].wait()

        def h_idx(c):
            rr = jax.lax.broadcasted_iota(
                jnp.int32, (WIN_ROWS, RES), 0).astype(jnp.float32)
            cc = jax.lax.broadcasted_iota(
                jnp.int32, (WIN_ROWS, RES), 1).astype(jnp.float32)
            h = jnp.floor(f(3, c) * rr + f(4, c) * cc + f(5, c) + 0.5)
            return jnp.clip(h.astype(jnp.int32), 0, WINDOW - 1)

        for c in range(cams):
            tmp_ref[c, 0:WIN_ROWS, :] = _gather_lanes(
                win_ref[c, :, :], h_idx(c))
        rows = jax.lax.broadcasted_iota(
            jnp.int32, (RES, RES), 0).astype(jnp.float32)
        cols = jax.lax.broadcasted_iota(
            jnp.int32, (RES, RES), 1).astype(jnp.float32)
        for c in range(cams):
            v_idx_t = jnp.floor(f(0, c) * cols + f(1, c) * rows
                                + f(2, c) + 0.5).astype(jnp.int32)
            out_tmp_ref[c, :, :] = _gather_lanes(
                tmp_ref[c, 0:WIN_ROWS, :].T,
                jnp.clip(v_idx_t, 0, WIN_ROWS - 1))
        for c in range(cams):
            ty = f(6, c) * rows + f(7, c) * cols + f(8, c)
            tx = f(9, c) * rows + f(10, c) * cols + f(11, c)
            valid = (ty >= 0) & (ty < f(12, c)) & (tx >= 0) & (tx < f(13, c))
            emit(c, jnp.where(valid, out_tmp_ref[c, :, :].T,
                              icoef_ref[c, 0, 3]))
        return

    for c in range(cams):
        packed = _variant_view(fcoef_ref, icoef_ref, c, win_ref.at[c],
                               dmas[c], tmp_ref, out_tmp_ref, mode)
        emit(c, packed)


def probe_warp(mip, cam_xy, cam_sc, scale, bg_color, mode='full',
               float_out=False):
    b = cam_xy.shape[0]
    fcoef, icoef = warp_coefficients(mip, cam_xy, cam_sc, scale, bg_color)
    if float_out:
        out_spec = pl.BlockSpec((CAMS, 3, RES, RES), lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((b, 3, RES, RES), jnp.float32)
    else:
        out_spec = pl.BlockSpec((CAMS, RES, RES), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((b, RES, RES), jnp.int32)
    return pl.pallas_call(
        functools.partial(_probe_kernel, cams=CAMS, mode=mode,
                          float_out=float_out),
        grid=(b // CAMS,),
        in_specs=[
            pl.BlockSpec((CAMS, 1, 14), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((CAMS, 1, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((CAMS, WIN_ROWS, WINDOW), jnp.int32),
            pltpu.SemaphoreType.DMA((CAMS,)),
            (pltpu.VMEM((CAMS, WINDOW, RES), jnp.int32)
             if mode in ('privscratch', 'stagemajor')
             else pltpu.VMEM((WINDOW, RES), jnp.int32)),
            (pltpu.VMEM((CAMS, RES, RES), jnp.int32)
             if mode in ('privscratch', 'stagemajor')
             else pltpu.VMEM((RES, RES), jnp.int32)),
        ],
    )(fcoef, icoef, mip.data[..., 0])


def main():
    sc = build_benchmark_scenario(batch_size=B, agent_count=20, res=RES)
    sim = sc.sim
    state = sim.state
    mip = select_mip(sim.renderer._mip_pyramid, fov=70.0)
    bg_color = jnp.zeros(3)
    scale = 2.0 / 70
    ego0 = state.agent_state[:, 0]

    variants = ['none', 'dmaonly', 'pass1only', 'nopass1', 'nomidT', 'mxuT',
                'nopass2', 'nofinalT', 'novalid', 'full', 'full_float',
                'privscratch', 'stagemajor']
    which = sys.argv[1:] or variants

    for name in which:
        mode = name
        float_out = False
        if name == 'full_float':
            mode, float_out = 'full', True

        def body(ego, _):
            ego = ego + 0.01
            cam_xy = ego[:, :2]
            cam_sc = jnp.stack([jnp.sin(ego[:, 2]), jnp.cos(ego[:, 2])], -1)
            if mode == 'none':
                return ego, jnp.sum(cam_xy) + jnp.sum(cam_sc)
            img = probe_warp(mip, cam_xy, cam_sc, scale, bg_color,
                             mode=mode, float_out=float_out)
            return ego, jnp.sum(img)

        @jax.jit
        def run(e):
            return jax.lax.scan(body, e, None, length=STEPS)

        sync_pin()
        for _ in range(3):
            out = run(ego0)
            float(jnp.sum(out[1]))
        t0 = time.perf_counter()
        out = run(ego0)
        float(jnp.sum(out[1]))
        dt = (time.perf_counter() - t0) / STEPS * 1000
        print(f"{name}: {dt:.3f} ms/step (B={B})", flush=True)


if __name__ == '__main__':
    main()
