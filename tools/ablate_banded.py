"""Ablate the banded prim-render pipeline INSIDE a jitted scan (isolated
timings are dispatch-dominated; see CLAUDE.md). Each variant runs the same
prim generation + camera transform, then a different cull/raster tail.

Usage: python tools/ablate_banded.py [variant ...]
Variants: gen, old, bandcull, banded, counted_full
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/tds_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np

from torchdrivesim_tpu.benchmark import build_benchmark_scenario
from torchdrivesim_tpu.ops.rasterize import (
    camera_rows_cols, cull_prims_to_view, prim_band_chunk_masks,
    sort_prims_rowmajor)
import torchdrivesim_tpu.ops.pallas_rasterize as pr

B = int(os.environ.get('AB_BATCH', 256))
RES = 128
STEPS = 50


def main():
    sc = build_benchmark_scenario(batch_size=B, agent_count=20, res=RES)
    sim = sc.sim
    state = sim.state
    gen = sim.birdview_mesh_generator
    renderer = sim.renderer
    all_state = jnp.concatenate([state.agent_state, state.npc_state], -2)
    present = jnp.concatenate([state.present_mask, state.npc_present_mask], -1)
    lights = state.traffic_control_state['traffic_light']
    from torchdrivesim_tpu.ops.pallas_warp import select_mip, warp_background_pallas
    mip = select_mip(renderer._mip_pyramid, fov=70.0)
    bg_color = jnp.zeros(3)

    def common(carry):
        st = carry + 0.01  # perturb so the scan isn't constant-folded
        quads, qz, qc, tris, tz, tc = gen.generate_prims(
            st, present_mask=present, traffic_light_state=lights)
        ego = st[:, 0]
        cam_xy = ego[:, :2]
        cam_sc = jnp.stack([jnp.sin(ego[:, 2]), jnp.cos(ego[:, 2])], -1)
        scale = 2.0 / 70
        b, q = qz.shape
        t = tz.shape[1]
        sq = camera_rows_cols(quads.reshape(b, q * 4, 2), cam_xy, cam_sc,
                              scale, RES).reshape(b, q, 4, 2)
        stt = camera_rows_cols(tris.reshape(b, t * 3, 2), cam_xy, cam_sc,
                               scale, RES).reshape(b, t, 3, 2)
        bg = warp_background_pallas(mip, cam_xy, cam_sc, scale, bg_color)
        return st, (sq, qz, qc, stt, tz, tc, bg, cam_xy, cam_sc, scale)

    def tail_gen(args):
        sq, qz, qc, stt, tz, tc, bg, *_ = args
        return jnp.sum(sq) + jnp.sum(stt) + jnp.sum(bg)

    def tail_gen_nowarp(args):
        sq, qz, qc, stt, tz, tc, bg, *_ = args
        return jnp.sum(sq) + jnp.sum(stt) + jnp.sum(qc) + jnp.sum(tc)

    def tail_sort_only(args):
        sq, qz, qc, stt, tz, tc, bg, *_ = args
        sq, qz, qc = sort_prims_rowmajor(sq, qz, qc, RES, 56)
        stt, tz, tc = sort_prims_rowmajor(stt, tz, tc, RES, 56)
        return (jnp.sum(sq) + jnp.sum(stt) + jnp.sum(qc) + jnp.sum(tc)
                + jnp.sum(qz) + jnp.sum(tz))

    def tail_old(args):
        sq, qz, qc, stt, tz, tc, bg, *_ = args
        sq, qz, qc = cull_prims_to_view(sq, qz, qc, RES, 56)
        stt, tz, tc = cull_prims_to_view(stt, tz, tc, RES, 56)
        img = pr.rasterize_hard_pallas_prims(sq, qz, qc, stt, tz, tc, RES, bg)
        return jnp.sum(img)

    def sortmask(args):
        sq, qz, qc, stt, tz, tc, bg, *_ = args
        sq, qz, qc = sort_prims_rowmajor(sq, qz, qc, RES, 56)
        stt, tz, tc = sort_prims_rowmajor(stt, tz, tc, RES, 56)
        qm = prim_band_chunk_masks(sq, RES, 4)
        tm = prim_band_chunk_masks(stt, RES, 4)
        return sq, qz, qc, stt, tz, tc, qm, tm, bg

    def tail_sortmask(args):
        sq, qz, qc, stt, tz, tc, qm, tm, bg = sortmask(args)
        return (jnp.sum(sq) + jnp.sum(stt) + jnp.sum(qc) + jnp.sum(tc)
                + jnp.sum(qm) + jnp.sum(tm) + jnp.sum(bg))

    def tail_banded(args):
        sq, qz, qc, stt, tz, tc, qm, tm, bg = sortmask(args)
        img = pr.rasterize_hard_pallas_prims_banded(
            sq, qz, qc, stt, tz, tc, RES, bg, qm, tm)
        return jnp.sum(img)

    def tail_fused(args):
        from torchdrivesim_tpu.ops.pallas_fused import render_prims_fused_pallas
        sq, qz, qc, stt, tz, tc, cam_xy, cam_sc, scale = (
            args[0], args[1], args[2], args[3], args[4], args[5],
            args[7], args[8], args[9])
        sq, qz, qc = sort_prims_rowmajor(sq, qz, qc, RES, 56)
        stt, tz, tc = sort_prims_rowmajor(stt, tz, tc, RES, 56)
        qm = prim_band_chunk_masks(sq, RES, 4)
        tm = prim_band_chunk_masks(stt, RES, 4)
        img = render_prims_fused_pallas(mip, cam_xy, cam_sc, scale, bg_color,
                                        sq, qz, qc, stt, tz, tc, qm, tm)
        return jnp.sum(img)

    def tail_sortmask2(args):
        from torchdrivesim_tpu.ops.rasterize import (
            sort_prims_rowmajor_with_masks)
        sq, qz, qc, stt, tz, tc, bg, *_ = args
        sq, qz, qc, qm = sort_prims_rowmajor_with_masks(sq, qz, qc, RES, 56, 4)
        stt, tz, tc, tm = sort_prims_rowmajor_with_masks(stt, tz, tc, RES, 56, 4)
        return (jnp.sum(sq) + jnp.sum(stt) + jnp.sum(qc) + jnp.sum(tc)
                + jnp.sum(qm) + jnp.sum(tm) + jnp.sum(bg))

    def tail_fused2(args):
        from torchdrivesim_tpu.ops.pallas_fused import render_prims_fused_pallas
        from torchdrivesim_tpu.ops.rasterize import (
            sort_prims_rowmajor_with_masks)
        sq, qz, qc, stt, tz, tc, cam_xy, cam_sc, scale = (
            args[0], args[1], args[2], args[3], args[4], args[5],
            args[7], args[8], args[9])
        sq, qz, qc, qm = sort_prims_rowmajor_with_masks(sq, qz, qc, RES, 56, 4)
        stt, tz, tc, tm = sort_prims_rowmajor_with_masks(stt, tz, tc, RES, 56, 4)
        img = render_prims_fused_pallas(mip, cam_xy, cam_sc, scale, bg_color,
                                        sq, qz, qc, stt, tz, tc, qm, tm)
        return jnp.sum(img)

    # --- fine-grained mask-cost isolation (the sortmask2 - sort_only delta
    # is ~0.34 ms at B=256 while the mask math looks trivial; these tails
    # bisect it: extras riding the sort -> shift tree -> strided slice ->
    # band compare, plus an MXU block-diagonal alternative) ---
    from torchdrivesim_tpu.ops.rasterize import (
        _prim_screen_stats, _sort_prim_arrays)
    big = jnp.float32(3e38)

    def _sorted_with_stats(cn, zz, cc):
        rmin, rmax, alive = _prim_screen_stats(cn, RES)
        cn, zz, cc, (rmin, rmax, af) = _sort_prim_arrays(
            jnp.where(alive, rmin, big), cn, zz, cc,
            extras=(rmin, rmax, alive.astype(jnp.float32)))
        return cn, zz, cc, rmin, rmax, af

    def _tree(rmin, rmax, af, chunk=8):
        n = rmin.shape[1]
        n_chunks = max(1, -(-n // chunk))
        pad = n_chunks * chunk - n
        lo_r = jnp.where(af > 0.5, rmin, 1e9)
        hi_r = jnp.where(af > 0.5, rmax, -1e9)
        if pad:
            lo_r = jnp.pad(lo_r, ((0, 0), (0, pad)), constant_values=1e9)
            hi_r = jnp.pad(hi_r, ((0, 0), (0, pad)), constant_values=-1e9)
        off = 1
        while off < chunk:
            lo_r = jnp.minimum(lo_r, jnp.pad(
                lo_r[:, off:], ((0, 0), (0, off)), constant_values=1e9))
            hi_r = jnp.maximum(hi_r, jnp.pad(
                hi_r[:, off:], ((0, 0), (0, off)), constant_values=-1e9))
            off *= 2
        return lo_r, hi_r

    def tail_m_extras(args):
        sq, qz, qc, stt, tz, tc, bg, *_ = args
        acc = 0.0
        for cn, zz, cc in ((sq, qz, qc), (stt, tz, tc)):
            cn, zz, cc, rmin, rmax, af = _sorted_with_stats(cn, zz, cc)
            acc += (jnp.sum(cn) + jnp.sum(zz) + jnp.sum(cc)
                    + jnp.sum(rmin) + jnp.sum(rmax) + jnp.sum(af))
        return acc

    def tail_m_tree(args):
        sq, qz, qc, stt, tz, tc, bg, *_ = args
        acc = 0.0
        for cn, zz, cc in ((sq, qz, qc), (stt, tz, tc)):
            cn, zz, cc, rmin, rmax, af = _sorted_with_stats(cn, zz, cc)
            lo_r, hi_r = _tree(rmin, rmax, af)
            acc += (jnp.sum(cn) + jnp.sum(zz) + jnp.sum(cc)
                    + jnp.sum(lo_r) + jnp.sum(hi_r))
        return acc

    def tail_m_slice(args):
        sq, qz, qc, stt, tz, tc, bg, *_ = args
        acc = 0.0
        for cn, zz, cc in ((sq, qz, qc), (stt, tz, tc)):
            cn, zz, cc, rmin, rmax, af = _sorted_with_stats(cn, zz, cc)
            lo_r, hi_r = _tree(rmin, rmax, af)
            acc += (jnp.sum(cn) + jnp.sum(zz) + jnp.sum(cc)
                    + jnp.sum(lo_r[:, ::8]) + jnp.sum(hi_r[:, ::8]))
        return acc

    def tail_m_bands(args):
        sq, qz, qc, stt, tz, tc, bg, *_ = args
        acc = 0.0
        band_h = RES / 4
        for cn, zz, cc in ((sq, qz, qc), (stt, tz, tc)):
            cn, zz, cc, rmin, rmax, af = _sorted_with_stats(cn, zz, cc)
            lo_r, hi_r = _tree(rmin, rmax, af)
            chunk_lo, chunk_hi = lo_r[:, ::8], hi_r[:, ::8]
            mask = jnp.stack(
                [(chunk_hi >= j * band_h) & (chunk_lo < (j + 1) * band_h)
                 for j in range(4)], axis=1)
            acc += (jnp.sum(cn) + jnp.sum(zz) + jnp.sum(cc)
                    + jnp.sum(mask.astype(jnp.int32)[:, :, None, :]))
        return acc

    def tail_m_matmul(args):
        sq, qz, qc, stt, tz, tc, bg, *_ = args
        acc = 0.0
        band_h = RES / 4
        bands_lo = jnp.arange(4, dtype=jnp.float32)[None, :, None] * band_h
        for cn, zz, cc in ((sq, qz, qc), (stt, tz, tc)):
            cn, zz, cc, rmin, rmax, af = _sorted_with_stats(cn, zz, cc)
            n = rmin.shape[1]
            n_chunks = max(1, -(-n // 8))
            lo = jnp.where(af > 0.5, rmin, 1e9)[:, None, :]   # (B, 1, N)
            hi = jnp.where(af > 0.5, rmax, -1e9)[:, None, :]
            hits = ((hi >= bands_lo) & (lo < bands_lo + band_h))  # (B, J, N)
            blockdiag = (jnp.arange(n)[:, None] // 8
                         == jnp.arange(n_chunks)[None, :]).astype(jnp.float32)
            m = jnp.matmul(hits.astype(jnp.float32), blockdiag)  # (B, J, C)
            mask = (m > 0).astype(jnp.int32)[:, :, None, :]
            acc += (jnp.sum(cn) + jnp.sum(zz) + jnp.sum(cc) + jnp.sum(mask))
        return acc

    def tail_fused_noprims(args):
        # all-zero occupancy masks: every prim chunk is skipped via @pl.when,
        # so this measures the kernel's warp + composite + fixed cost; the
        # delta vs 'fused2' is the in-kernel prim math
        from torchdrivesim_tpu.ops.pallas_fused import render_prims_fused_pallas
        from torchdrivesim_tpu.ops.rasterize import (
            sort_prims_rowmajor_with_masks)
        sq, qz, qc, stt, tz, tc, cam_xy, cam_sc, scale = (
            args[0], args[1], args[2], args[3], args[4], args[5],
            args[7], args[8], args[9])
        sq, qz, qc, qm = sort_prims_rowmajor_with_masks(sq, qz, qc, RES, 56, 4)
        stt, tz, tc, tm = sort_prims_rowmajor_with_masks(stt, tz, tc, RES, 56, 4)
        img = render_prims_fused_pallas(mip, cam_xy, cam_sc, scale, bg_color,
                                        sq, qz, qc, stt, tz, tc,
                                        qm * 0, tm * 0)
        return jnp.sum(img)

    tails = {'gen': tail_gen, 'gen_nowarp': tail_gen_nowarp,
             'fused_noprims': tail_fused_noprims,
             'sort_only': tail_sort_only, 'old': tail_old,
             'sortmask': tail_sortmask, 'banded': tail_banded,
             'fused': tail_fused, 'sortmask2': tail_sortmask2,
             'fused2': tail_fused2,
             'm_extras': tail_m_extras, 'm_tree': tail_m_tree,
             'm_slice': tail_m_slice, 'm_bands': tail_m_bands,
             'm_matmul': tail_m_matmul}
    which = sys.argv[1:] or list(tails)

    for name in which:
        tail = tails[name]

        def body(carry, _):
            carry, args = common(carry)
            return carry, tail(args)

        @jax.jit
        def run(st):
            return jax.lax.scan(body, st, None, length=STEPS)

        from torchdrivesim_tpu.benchmark import sync_pin
        sync_pin()
        # warmup must end in a VALUE FETCH: fresh executables dispatch ~5x
        # slow until one output has actually been fetched (see BENCH_NOTES)
        for _ in range(3):
            out = run(all_state)
            float(jnp.sum(out[1]))
        t0 = time.perf_counter()
        out = run(all_state)
        float(jnp.sum(out[1]))     # value fetch: true barrier on the tunnel
        dt = (time.perf_counter() - t0) / STEPS * 1000
        print(f"{name}: {dt:.3f} ms/step (B={B})", flush=True)


if __name__ == '__main__':
    main()
