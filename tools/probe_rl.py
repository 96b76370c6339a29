"""Piecewise timing of the RL bench config (config5) on TPU.

Variants isolate where the 9.9 ms/step goes: full loop, no-policy,
no-render, policy-only. Run each variant in its own process:
    python tools/probe_rl.py full|nopolicy|norender|policyonly
"""
import json
import sys
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/tds_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp


def main(variant):
    from torchdrivesim_tpu.benchmark import build_benchmark_scenario, sync_pin
    from torchdrivesim_tpu.models import ActorCritic
    b, res = 1024, 64
    sc = build_benchmark_scenario(batch_size=b, agent_count=8, res=res)
    sim = sc.sim
    render = variant != 'norender'
    step = sc.make_step_fn(render=render, metrics=True)
    model = ActorCritic(action_size=2, features=(16, 32))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, res, res)))

    @jax.jit
    def rollout(carry):
        state, key = carry
        def body(c, _):
            s, k = c
            k, sub = jax.random.split(k)
            s, out = step(s, jnp.zeros((b, 8, 2)))
            if variant == 'policyonly':
                image = jnp.zeros((b, 3, res, res))
            elif render:
                image = out['image']
            else:
                image = None
            if variant in ('full', 'policyonly', 'norender'):
                if image is None:
                    image = jnp.zeros((b, 3, res, res))
                mean, log_std, value = model.apply(params, image)
                act = mean + jnp.exp(log_std) * jax.random.normal(sub, mean.shape)
                extra = jnp.sum(act) * 0 + jnp.sum(value) * 0
            else:  # nopolicy
                extra = jnp.sum(image) * 0
            reward = (0.1 * s.agent_state[:, 0, 3]
                      - out['collision'][:, 0] - out['offroad'][:, 0])
            return (s, k), jnp.sum(reward) + extra
        (s, k), acc = jax.lax.scan(body, (state, key), None, length=16)
        return (s, k), jnp.sum(acc)

    sync_pin()
    carry = (sim.state, jax.random.PRNGKey(0))
    carry, acc = rollout(carry)
    float(acc)
    t0 = time.perf_counter()
    for _ in range(3):
        carry, acc = rollout(carry)
    float(acc)
    dt = time.perf_counter() - t0
    print(json.dumps({
        'variant': variant,
        'ms_per_step': round(dt / (16 * 3) * 1000, 3),
        'env_steps_per_sec': round(b * 16 * 3 / dt, 1)}), flush=True)


if __name__ == '__main__':
    main(sys.argv[1] if len(sys.argv) > 1 else 'full')
