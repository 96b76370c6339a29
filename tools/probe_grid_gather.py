"""Probe: can a Pallas scalar-loop VMEM gather beat XLA's gather lowering?

Context (CLAUDE.md round-2 notes): offroad+wrongway cost ~0.25 ms/step at
B=256 — 20k+5k scattered gathers at XLA's ~125M elem/s scalar-loop floor.
The quad-packed Town02 grid (589x590x2 int32 = 2.8 MB) fits VMEM, so a
kernel with the grid resident and per-query scalar loads could cut that.

Variants probed (each timed over a K-step dependent scan, per the axon
timing protocol — sync_pin first, end with a value fetch):
  xla     — advanced-indexing gather on (H, W, 2) int32 (status quo).
  smem_u8 — Pallas: idx in SMEM, grid (2, H, W) VMEM, scalar loads,
            out in SMEM, fori_loop unroll=8.
  vmem_u8 — same but output scalar-stores into VMEM.
  smem_u16— unroll=16 variant.

Run CPU first for correctness: TDS_PLATFORM=cpu PROBE_INTERPRET=1 python
tools/probe_grid_gather.py; then plain on TPU.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import torchdrivesim_tpu  # noqa: F401  (platform override handling)
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/tds_tpu_jax_cache")
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = bool(int(os.environ.get("PROBE_INTERPRET", "0")))
H, W = 592, 592
N = 25600
CHUNK = 1024
assert N % CHUNK == 0
K = int(os.environ.get("PROBE_K", "50"))

rng = np.random.default_rng(0)
grid_hwc = rng.integers(1, 1 << 20, size=(H, W, 2), dtype=np.int32)
grid_chw = np.ascontiguousarray(np.moveaxis(grid_hwc, -1, 0))
ys0 = rng.integers(0, H, size=(N,), dtype=np.int32)
xs = rng.integers(0, W, size=(N,), dtype=np.int32)


def xla_gather(ys, xs, grid):
    return grid[ys, xs]  # (N, 2)


def make_pallas(unroll: int, out_smem: bool):
    assert CHUNK % unroll == 0

    def kernel(ys_ref, xs_ref, grid_ref, out_ref):
        def body(i, c):
            base = i * unroll
            for u in range(unroll):  # manual unroll: Mosaic rejects unroll=k
                y = ys_ref[base + u]
                x = xs_ref[base + u]
                out_ref[base + u, 0] = grid_ref[0, y, x]
                out_ref[base + u, 1] = grid_ref[1, y, x]
            return c
        jax.lax.fori_loop(0, CHUNK // unroll, body, 0)

    out_space = pltpu.SMEM if out_smem else pltpu.ANY
    out_spec = (pl.BlockSpec((CHUNK, 2), lambda i: (i, 0),
                             memory_space=pltpu.SMEM) if out_smem
                else pl.BlockSpec((CHUNK, 2), lambda i: (i, 0)))

    def run(ys, xs, grid):
        return pl.pallas_call(
            kernel,
            grid=(N // CHUNK,),
            in_specs=[
                pl.BlockSpec((CHUNK,), lambda i: (i,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((CHUNK,), lambda i: (i,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((2, H, W), lambda i: (0, 0, 0)),
            ],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((N, 2), jnp.int32),
            interpret=INTERPRET,
        )(ys, xs, grid)
    return run


def timed(name, fn, grid):
    @jax.jit
    def loop(ys):
        def step(ys, _):
            out = fn(ys, xs_d, grid)
            dep = (out[:, 0] ^ out[:, 1]) & 1
            return (ys + dep.astype(jnp.int32)) % H, ()
        ys, _ = jax.lax.scan(step, ys, None, length=K)
        return ys

    ys_d = jnp.asarray(ys0)
    # correctness vs the XLA path on one application
    want = np.asarray(xla_gather(jnp.asarray(ys0), xs_d, jnp.asarray(grid_hwc)))
    got = np.asarray(fn(jnp.asarray(ys0), xs_d, grid))
    assert np.array_equal(want, got), f"{name}: MISMATCH"

    out = loop(ys_d)
    _ = np.asarray(out)  # warm + fetch
    t0 = time.perf_counter()
    out = loop(ys_d)
    _ = np.asarray(out)
    dt = time.perf_counter() - t0
    per = dt / K
    print(f"{name:10s}: {per * 1e6:9.1f} us/iter "
          f"({N * 2 / per / 1e6:8.1f} M elem/s)")
    return per


def main():
    global xs_d
    from torchdrivesim_tpu import benchmark
    benchmark.sync_pin()
    xs_d = jnp.asarray(xs)
    grid_hwc_d = jnp.asarray(grid_hwc)
    grid_chw_d = jnp.asarray(grid_chw)

    results = {}
    results["xla"] = timed("xla", xla_gather, grid_hwc_d)
    for name, unroll, out_smem in [("smem_u8", 8, True),
                                   ("vmem_u8", 8, False),
                                   ("smem_u16", 16, True)]:
        try:
            fn = make_pallas(unroll, out_smem)
            results[name] = timed(name, fn, grid_chw_d)
        except Exception as e:  # noqa: BLE001 — probe must report all variants
            print(f"{name:10s}: FAILED {type(e).__name__}: {str(e)[:300]}")
    best = min((v, k) for k, v in results.items())
    print(f"best: {best[1]} ({best[0]*1e6:.1f} us; "
          f"xla/best = {results['xla'] / best[0]:.2f}x)")


if __name__ == "__main__":
    main()
