"""
Capture a jax.profiler trace of the benchmark step for TensorBoard.

Usage:
    python tools/capture_trace.py --outdir /tmp/tds_trace --batch 64
Then: tensorboard --logdir /tmp/tds_trace
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--outdir', default='/tmp/tds_trace')
    parser.add_argument('--batch', type=int, default=64)
    parser.add_argument('--steps', type=int, default=10)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from torchdrivesim_tpu.benchmark import build_benchmark_scenario

    sc = build_benchmark_scenario(batch_size=args.batch, agent_count=20)
    sim = sc.sim
    step = sc.make_step_fn(render=True, metrics=True)

    @jax.jit
    def one(state, action):
        state, out = step(state, action)
        return state, sum(jnp.sum(v.astype(jnp.float32)) for v in out.values())

    action = jnp.zeros((args.batch, sim.agent_count, 2))
    state, checksum = one(sim.state, action)
    checksum.block_until_ready()  # compile outside the trace

    with jax.profiler.trace(args.outdir):
        for _ in range(args.steps):
            state, checksum = one(state, action)
        checksum.block_until_ready()
    print(f"trace written to {args.outdir}")


if __name__ == '__main__':
    main()
