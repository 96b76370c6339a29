"""Bisect WHICH part of the scalar-loop VMEM gather Mosaic rejects.

Variants (all tiny, compile+run only):
  static      — scalar load grid[0, 5, 7] at static indices -> SMEM out
  dyn_sub     — dynamic sublane index, static lane: grid[0, y, 7]
  dyn_lane    — static sublane, dynamic lane: grid[0, 5, x]
  dyn_both    — grid[0, y, x]
  ds_load     — pl.load(grid, (0, pl.ds(y,1), pl.ds(x,1))) -> vector (1,1),
                reduced to scalar via jnp.sum, stored to SMEM
  smem_grid   — grid lives in SMEM (small 64x64 slab), grid[0, y, x]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import torchdrivesim_tpu  # noqa: F401
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/tds_tpu_jax_cache")
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W, N = 64, 64, 64
grid = jnp.asarray(np.arange(2 * H * W, dtype=np.int32).reshape(2, H, W))
ys = jnp.asarray(np.arange(N, dtype=np.int32) % H)
xs = jnp.asarray((np.arange(N, dtype=np.int32) * 7) % W)


def run(name, body, grid_smem=False):
    def kernel(ys_ref, xs_ref, grid_ref, out_ref):
        def loop(i, c):
            out_ref[i] = body(grid_ref, ys_ref[i], xs_ref[i])
            return c
        jax.lax.fori_loop(0, N, loop, 0)

    gspace = pltpu.SMEM if grid_smem else None
    gspec = (pl.BlockSpec(memory_space=pltpu.SMEM) if grid_smem
             else pl.BlockSpec((2, H, W), lambda: (0, 0, 0)))
    try:
        out = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM),
                      gspec],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((N,), jnp.int32),
        )(ys, xs, grid)
        got = np.asarray(out)
        print(f"{name:10s}: OK   first4={got[:4]}")
    except Exception as e:  # noqa: BLE001
        msg = str(e).replace("\n", " ")[:160]
        print(f"{name:10s}: FAIL {type(e).__name__}: {msg}")


run("static", lambda g, y, x: g[0, 5, 7])
run("dyn_sub", lambda g, y, x: g[0, y, 7])
run("dyn_lane", lambda g, y, x: g[0, 5, x])
run("dyn_both", lambda g, y, x: g[0, y, x])
run("ds_load", lambda g, y, x: jnp.sum(
    pl.load(g, (0, pl.ds(y, 1), pl.ds(x, 1)))))
run("smem_grid", lambda g, y, x: g[0, y, x], grid_smem=True)
