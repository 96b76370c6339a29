"""Probe 3: the decisive gather menu for round 3.

Two big levers hinge on one primitive — a vectorized SUBLANE-dynamic gather
(out[i,j] = T[idx[i,j], j]):
  * pass 2 of the background warp could gather along sublanes directly,
    killing BOTH (256,128) transposes in the fused kernel;
  * the offroad/wrong-way grid sample could become (sublane-gather of rows,
    then lane-gather), replacing XLA's ~9.4-cycle/query scalar loop.

Variants (correctness-checked, then timed over a dependent 200-step scan
per the axon protocol — sync_pin first, end with a value fetch):
  xla2d      — T2d[y, x] advanced indexing (status quo baseline)
  xla_rowg   — T[rows] full-row gather (25600, 128)
  taa0_big   — jnp.take_along_axis(T (2960,128), idx (25600,128), axis=0)
  taa0_sq    — take_along_axis on square (128,128) table, idx (128,128)
  taa1_big   — lane gather (known-fast reference): take_along axis=1
  pl_taa0    — taa0 on (8,128) INSIDE a pallas kernel (vreg-local)
  pl_serial  — pallas fori_loop, scalar dyn-sublane load, static lane 0
  smem_cap   — bisect max SMEM array bytes Mosaic accepts

Usage: python tools/probe_gather3.py [variant ...]
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import torchdrivesim_tpu  # noqa: F401
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/tds_tpu_jax_cache")
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 2960, 128
Q = 25600
STEPS = 200

rng = np.random.default_rng(0)
T_np = rng.integers(1, 1 << 20, size=(H, W), dtype=np.int32)
T = jnp.asarray(T_np)
T2d_np = rng.integers(1, 1 << 20, size=(592, 640), dtype=np.int32)
T2d = jnp.asarray(T2d_np)
ys_np = rng.integers(0, 592, size=(Q,), dtype=np.int32)
xs_np = rng.integers(0, 640, size=(Q,), dtype=np.int32)
rows_np = rng.integers(0, H, size=(Q,), dtype=np.int32)
ys, xs, rows = jnp.asarray(ys_np), jnp.asarray(xs_np), jnp.asarray(rows_np)
ridx_big_np = rng.integers(0, H, size=(Q, W), dtype=np.int32)
ridx_big = jnp.asarray(ridx_big_np)
ridx_sq = jnp.asarray(rng.integers(0, 128, size=(128, 128), dtype=np.int32))
lidx_big = jnp.asarray(rng.integers(0, W, size=(Q // W, W), dtype=np.int32))
Tsq = T[:128]


def timed(fn, tag, elems):
    from torchdrivesim_tpu.benchmark import sync_pin
    roll = jax.jit(fn)
    try:
        sync_pin()
        for _ in range(2):
            float(roll(jnp.int32(1)))
        t0 = time.perf_counter()
        float(roll(jnp.int32(3)))
        dt = (time.perf_counter() - t0) / STEPS
        print(f"{tag:10s}: {dt*1e6:8.1f} us/it  ({elems/dt/1e6:8.0f} M elem/s)",
              flush=True)
    except Exception as e:  # noqa: BLE001
        msg = str(e).replace("\n", " ")[:140]
        print(f"{tag:10s}: FAIL {type(e).__name__}: {msg}", flush=True)


def scan_over(expr):
    def roll(seed):
        def body(c, _):
            return c + 1, expr(c)
        c, s = jax.lax.scan(body, seed, None, length=STEPS)
        return jnp.sum(s)
    return roll


def v_control():
    timed(scan_over(lambda c: (c * 2 + 1).astype(jnp.int32)), "control", 1)


def v_xla2d():
    timed(scan_over(lambda c: jnp.sum(T2d[(ys + c) % 592, (xs + c) % 640])),
          "xla2d", Q)


def v_xla2d_quad():
    """Status-quo emulation: quad 2-channel gather + direction gather."""
    T2d2 = jnp.asarray(
        rng.integers(1, 1 << 20, size=(592, 640, 2), dtype=np.int32))

    def expr(c):
        y4 = (ys + c) % 592
        x4 = (xs + c) % 640
        quad = T2d2[y4[:20480], x4[:20480]]          # (20480, 2)
        dirg = T2d[y4[:5120], x4[:5120]]             # (5120,)
        return jnp.sum(quad) + jnp.sum(dirg)
    timed(scan_over(expr), "xla2d_quad", Q)


def v_rowg_reduce():
    """Candidate: row-gather + masked lane reduce for quad+direction."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)

    def expr(c):
        r = (rows + c) % H
        l = (xs + c) % 64
        rq = T[r[:20480]]                            # (20480, 128) rows
        l2 = (2 * l[:20480])[:, None]
        g0 = jnp.sum(jnp.where(lane == l2, rq, 0), axis=1)
        g1 = jnp.sum(jnp.where(lane == l2 + 1, rq, 0), axis=1)
        rd = T[r[:5120]]                             # (5120, 128)
        ld = (xs[:5120] + c)[:, None] % 128
        gd = jnp.sum(jnp.where(lane == ld, rd, 0), axis=1)
        return jnp.sum(g0) + jnp.sum(g1) + jnp.sum(gd)
    timed(scan_over(expr), "rowg_red", Q)


def v_rowg_dot():
    """Row-gather + one-hot MXU contraction for the lane select."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)

    def expr(c):
        r = (rows + c) % H
        l = ((xs + c) % 128)[:, None]
        rq = T[r].astype(jnp.float32)                # (25600, 128)
        oh = (lane == l).astype(jnp.float32)
        return jnp.sum(rq * oh)
    timed(scan_over(expr), "rowg_dot", Q)


def v_xla_rowg():
    timed(scan_over(lambda c: jnp.sum(T[(rows + c) % H])), "xla_rowg", Q)


def v_taa0_big():
    timed(scan_over(lambda c: jnp.sum(
        jnp.take_along_axis(T, (ridx_big + c) % H, axis=0))),
        "taa0_big", Q * W)


def v_taa0_sq():
    timed(scan_over(lambda c: jnp.sum(
        jnp.take_along_axis(Tsq, (ridx_sq + c) % 128, axis=0))),
        "taa0_sq", 128 * 128)


def v_taa1_big():
    t_l = T[:Q // W]
    timed(scan_over(lambda c: jnp.sum(
        jnp.take_along_axis(t_l, (lidx_big + c) % W, axis=1))),
        "taa1_big", Q)


def _pl_taa0_kernel(t_ref, i_ref, o_ref):
    o_ref[:, :] = jnp.take_along_axis(t_ref[:, :], i_ref[:, :], axis=0)


def v_pl_taa0():
    idx8 = jnp.asarray(rng.integers(0, 8, size=(8, 128), dtype=np.int32))
    t8 = T[:8]

    def call(c):
        out = pl.pallas_call(
            _pl_taa0_kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        )(t8, (idx8 + c) % 8)
        return jnp.sum(out)
    timed(scan_over(call), "pl_taa0", 8 * 128)


def _serial_kernel(r_ref, t_ref, o_ref, *, n):
    def body(i, c):
        o_ref[0, i] = t_ref[r_ref[0, i], 0]
        return c
    jax.lax.fori_loop(0, n, body, 0)


def v_pl_serial():
    n = Q

    def call(c):
        r2 = ((rows + c) % H).reshape(1, n)
        out = pl.pallas_call(
            functools.partial(_serial_kernel, n=n),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, n), jnp.int32),
        )(r2, T)
        return jnp.sum(out)
    timed(scan_over(call), "pl_serial", Q)


def v_smem_cap():
    def try_bytes(nbytes):
        n = nbytes // 4

        def kernel(g_ref, o_ref):
            o_ref[0] = g_ref[0] + g_ref[n - 1]
        try:
            g = jnp.arange(n, dtype=jnp.int32)
            out = pl.pallas_call(
                kernel,
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
                out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
            )(g)
            return int(out[0]) == n - 1
        except Exception:  # noqa: BLE001
            return False

    for kb in [16, 64, 128, 256, 384, 512, 768, 1024, 1536]:
        ok = try_bytes(kb * 1024)
        print(f"smem {kb:5d} KB: {'OK' if ok else 'FAIL'}", flush=True)
        if not ok:
            break


ALL = {
    'control': v_control, 'xla2d': v_xla2d, 'xla2d_quad': v_xla2d_quad,
    'xla_rowg': v_xla_rowg, 'rowg_red': v_rowg_reduce,
    'rowg_dot': v_rowg_dot, 'taa0_big': v_taa0_big,
    'taa0_sq': v_taa0_sq, 'taa1_big': v_taa1_big, 'pl_taa0': v_pl_taa0,
    'pl_serial': v_pl_serial, 'smem_cap': v_smem_cap,
}

if __name__ == '__main__':
    which = sys.argv[1:] or list(ALL)
    for name in which:
        ALL[name]()
