#!/usr/bin/env python
"""
Headline benchmark: env-steps/sec/chip for the full simulation step
(bicycle kinematics for ~20 vehicles, traffic lights, egocentric 128x128
BEV render, collision + offroad + wrong-way infractions) at batch 256.

Prints ONE JSON line. The BASELINE target is >= 100,000 env-steps/sec/chip.

Note: the benchmark runs on carla_Town02 because carla_Town03's geometry
assets (.osm / mesh JSON) are stripped from this checkout of the reference
(SURVEY.md §2.4); Town02 has the full asset set and equivalent structure.
"""
import json
import os
import sys

TARGET = 100_000.0


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/tds_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    batch_size = int(os.environ.get('BENCH_BATCH', 256))
    res = int(os.environ.get('BENCH_RES', 128))
    from torchdrivesim_tpu.benchmark import build_benchmark_scenario, run_benchmark
    scenario = build_benchmark_scenario(
        map_name=os.environ.get('BENCH_MAP', 'carla_Town02'),
        batch_size=batch_size, agent_count=20, res=res)
    # 1000-step chunks: the timed region must be long enough that the
    # tunnel's per-process fetch RTT (3-130 ms lottery) is noise — at
    # 50-step chunks it cost ~0.17 ms/step (168k vs the 194k steady state)
    stats = run_benchmark(scenario,
                          steps_per_chunk=int(os.environ.get('BENCH_STEPS', 1000)),
                          n_chunks=int(os.environ.get('BENCH_CHUNKS', 3)))
    # median of the per-chunk rates: robust to a one-off tunnel hiccup,
    # and the min/max spread makes the claim auditable
    value = stats['chunk_rate_median']
    print(json.dumps({
        'metric': 'env-steps/sec/chip incl. 128x128 BEV render '
                  f'(batch {batch_size}, carla_Town02; Town03 assets stripped upstream)',
        'value': round(value, 1),
        'unit': 'env-steps/sec',
        'vs_baseline': round(value / TARGET, 4),
        'chunk_rates_min_max': [round(stats['chunk_rates'][0], 1),
                                round(stats['chunk_rates'][-1], 1)],
    }))


if __name__ == '__main__':
    sys.exit(main())
