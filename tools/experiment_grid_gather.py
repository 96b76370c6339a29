"""
Experiment: can a Pallas kernel beat XLA's scalar-loop gather for the
baked-map grid samples (offroad quad + wrong-way direction)?

XLA lowers scattered gathers on TPU to ~125M elem/s scalar loops; at the
headline shapes (B=256 x A=20 -> 20480 offroad + 5120 wrong-way queries)
that's the ~0.25 ms metric floor (CLAUDE.md). The quad-packed Town02 grid is
~2.8 MB int32 -- it fits VMEM -- so a kernel holding the grid resident and
doing per-query scalar loads (indices staged through SMEM) could beat the
XLA loop if Mosaic's dynamic scalar VMEM loads are faster than ~8 ns each.

Run on TPU: python tools/experiment_grid_gather.py
Correctness check on CPU: TDS_PLATFORM=cpu ... --interpret
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/tds_tpu_jax_cache")

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 2048      # queries per kernel program


def _gather_kernel(iy_ref, ix_ref, g_ref, o0_ref, o1_ref, *, chunk):
    def body(j, carry):
        iy = iy_ref[0, j]
        ix = ix_ref[0, j]
        o0_ref[0, j] = g_ref[iy, ix, 0]
        o1_ref[0, j] = g_ref[iy, ix, 1]
        return carry
    jax.lax.fori_loop(0, chunk, body, 0)


def pallas_gather(grid_data, iy, ix, interpret=False, chunk=CHUNK):
    """grid_data: (H, W, 2) int32; iy/ix: (N,) int32 in-bounds."""
    CHUNK = chunk
    n = iy.shape[0]
    p = -(-n // CHUNK)
    if p * CHUNK != n:
        pad = p * CHUNK - n
        iy = jnp.concatenate([iy, jnp.zeros(pad, jnp.int32)])
        ix = jnp.concatenate([ix, jnp.zeros(pad, jnp.int32)])
    iy2 = iy.reshape(p, CHUNK)
    ix2 = ix.reshape(p, CHUNK)
    h, w, _ = grid_data.shape
    outs = pl.pallas_call(
        functools.partial(_gather_kernel, chunk=CHUNK),
        grid=(p,),
        in_specs=[
            pl.BlockSpec((1, CHUNK), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, CHUNK), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            # constant index_map: Mosaic copies the grid to VMEM once and
            # keeps it resident across programs
            pl.BlockSpec((h, w, 2), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, CHUNK), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, CHUNK), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((p, CHUNK), jnp.int32)] * 2,
        interpret=interpret,
    )(iy2, ix2, grid_data)
    return (outs[0].reshape(p * CHUNK)[:n],
            outs[1].reshape(p * CHUNK)[:n])


def main():
    interpret = '--interpret' in sys.argv
    h, w = 592, 640
    # 20480 offroad corners + 5120 wrong-way centers (tiny in interpret
    # mode: the interpreter evaluates the scalar loop per iteration)
    n = 256 if interpret else 25600
    chunk = 128 if interpret else CHUNK
    rng = np.random.RandomState(0)
    grid = jnp.asarray(rng.randint(-2**30, 2**30, (h, w, 2), np.int32))
    iy0 = rng.randint(0, h, n).astype(np.int32)
    ix0 = rng.randint(0, w, n).astype(np.int32)
    iy0j, ix0j = jnp.asarray(iy0), jnp.asarray(ix0)

    # correctness
    o0, o1 = pallas_gather(grid, iy0j, ix0j, interpret=interpret,
                           chunk=chunk)
    want = np.asarray(grid)[iy0, ix0]
    np.testing.assert_array_equal(np.asarray(o0), want[:, 0])
    np.testing.assert_array_equal(np.asarray(o1), want[:, 1])
    print("correctness OK")
    if interpret:
        return

    from torchdrivesim_tpu.benchmark import sync_pin
    steps = 200

    def timed(fn, tag):
        roll = jax.jit(fn)
        sync_pin()
        for _ in range(2):
            c = roll(jnp.int32(1))
            float(c)
        t0 = time.perf_counter()
        c = roll(jnp.int32(3))
        float(c)
        dt = (time.perf_counter() - t0) / steps
        print(f"{tag}: {dt*1e6:.1f} us/step "
              f"({n/dt/1e6:.0f}M query/s)")
        return dt

    # vary indices per scan step so nothing hoists/CSEs
    def xla_roll(seed):
        def body(c, _):
            iy = (iy0j + c) % h
            ix = (ix0j + c) % w
            v = grid[iy, ix]                    # XLA gather
            return c + 1, jnp.sum(v)
        c, s = jax.lax.scan(body, seed, None, length=steps)
        return jnp.sum(s)

    def pallas_roll(seed):
        def body(c, _):
            iy = (iy0j + c) % h
            ix = (ix0j + c) % w
            a, b = pallas_gather(grid, iy, ix)
            return c + 1, jnp.sum(a) + jnp.sum(b)
        c, s = jax.lax.scan(body, seed, None, length=steps)
        return jnp.sum(s)

    timed(xla_roll, "XLA gather (N=25600, 2ch)")
    timed(pallas_roll, "Pallas scalar-load kernel")


if __name__ == '__main__':
    main()
