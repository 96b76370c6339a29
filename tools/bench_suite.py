"""
Full benchmark suite: the five BASELINE workload configs (BASELINE.md).

1. simulate-style: 20 vehicles, bicycle kinematics, BEV render, batch 1,
   100-step rollout.
2. Batched infractions: 64-scene batch, collision + offroad + wrong-way
   every step (no rendering).
3. Heterogeneous agents + traffic controls: vehicles/pedestrians/cyclists
   with per-type kinematics, lights + stoplines.
4. IL-style: gradients through a 40-step differentiable rollout
   (dynamics + soft BEV render).
5. RL-style: 1024 vectorized envs with replay NPCs, PPO-shaped rollout
   fully on-device.

Prints one JSON line per config. Run on TPU: python tools/bench_suite.py
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/tds_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np


def _image_sum(img):
    """Checksum an image output; packed RGB8 decodes lazily (fused by XLA)."""
    from torchdrivesim_tpu.rendering.jax_renderer import image_checksum
    return image_checksum(img)


def timed_steps(rollout_fn, state, n_warm=4, n_timed=3):
    # pin the tunneled client's synchronous dispatch mode and end the timed
    # region with a value fetch: async-mode completion signals are
    # unreliable (see benchmark.run_benchmark)
    from torchdrivesim_tpu.benchmark import sync_pin
    sync_pin()
    # several warmup dispatches ending in a VALUE FETCH: early executions
    # of a fresh executable run ~5x slower on the tunneled client until an
    # output value has actually been fetched (block_until_ready does not
    # trigger whatever lazy initialization the fetch does)
    for _ in range(n_warm):
        state, checksum = rollout_fn(state)
        float(jnp.sum(checksum))
    t0 = time.perf_counter()
    for _ in range(n_timed):
        state, checksum = rollout_fn(state)
    float(jnp.sum(checksum))
    return time.perf_counter() - t0


def config1_simulate():
    from torchdrivesim_tpu.benchmark import build_benchmark_scenario, sync_pin
    # BASELINE config 1 names carla_Town01 (its mesh JSON ships upstream)
    sc = build_benchmark_scenario(map_name='carla_Town01', batch_size=1,
                                  agent_count=20, res=128)
    step = sc.make_step_fn(render=True, metrics=True, packed_image=True)

    @jax.jit
    def rollout(state):
        def body(s, _):
            s, out = step(s, jnp.zeros((1, 20, 2)))
            return s, _image_sum(out['image'])
        s, acc = jax.lax.scan(body, state, None, length=100)
        return s, jnp.sum(acc)

    # batch-1 latency is dominated by the tunnel's per-dispatch round trip,
    # which varies PER PROCESS (3-26 ms for even an empty dispatch);
    # measure it in-process and report the device-only rate alongside
    @jax.jit
    def trivial(t):
        c, _ = jax.lax.scan(lambda c, _: (c + 1, None), t, None, length=100)
        return c

    sync_pin()
    y = trivial(jnp.int32(0)); y.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(8):
        y = trivial(y)
    float(y)
    rtt = (time.perf_counter() - t0) / 8

    state, cks = rollout(sc.sim.state)
    cks.block_until_ready()
    # throughput: dispatches pipeline when not blocked between calls; the
    # single final value fetch is an honest barrier (pinned mode)
    n = 40
    t0 = time.perf_counter()
    for _ in range(n):
        state, cks = rollout(state)
    float(cks)
    dt_pipe = (time.perf_counter() - t0) / n
    # latency: one blocking round trip per rollout (noisy over the tunnel:
    # the per-process RTT lottery spans 3-130 ms; best-of-N is the stable
    # figure, and dispatch_rtt_ms records this process's draw)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        state, cks = rollout(state)
        float(cks)
        times.append(time.perf_counter() - t0)
    # image_output records that this config switched to packed RGB8 output
    # in round 2 (round-1 figures were measured with float images; the flip
    # measured perf-neutral but is kept visible for comparability)
    return {'config': 'simulate_100step_batch1_town01',
            'env_steps_per_sec': round(100 / dt_pipe, 1),
            'blocking_latency_ms': round(min(times) * 1e3, 2),
            'dispatch_rtt_ms': round(rtt * 1e3, 2),
            'image_output': 'packed_rgb8'}


def config2_infractions():
    from torchdrivesim_tpu.benchmark import build_benchmark_scenario
    # BASELINE names carla_Town03, whose .osm/mesh are stripped from the
    # upstream checkout (.MISSING_LARGE_BLOBS) -- Town02 substitutes
    sc = build_benchmark_scenario(batch_size=64, agent_count=20, res=128,
                                  use_texture=False)
    step = sc.make_step_fn(render=False, metrics=True)

    @jax.jit
    def rollout(state):
        def body(s, _):
            s, out = step(s, jnp.zeros((64, 20, 2)))
            return s, sum(jnp.sum(v.astype(jnp.float32)) for v in out.values())
        # 500-step chunks: short timed regions under-read by the tunnel's
        # fixed fetch RTT (same effect as the headline bench, BENCH_NOTES)
        s, acc = jax.lax.scan(body, state, None, length=500)
        return s, jnp.sum(acc)

    dt = timed_steps(rollout, sc.sim.state)
    return {'config': 'batched_infractions_batch64_town02_sub_for_town03',
            'env_steps_per_sec': round(64 * 500 * 3 / dt, 1)}


def config3_heterogeneous():
    import torchdrivesim_tpu.kinematic as K
    from torchdrivesim_tpu.benchmark import build_benchmark_scenario
    # BASELINE config 3 names carla_Town10HD: mesh/grids/texture are baked
    # by our lanelet2 pipeline from the .osm the upstream checkout retains
    sc = build_benchmark_scenario(map_name='carla_Town10HD', batch_size=64,
                                  agent_count=20, res=128)
    sim = sc.sim
    # per-type kinematics: vehicles (bicycle), pedestrians (simple),
    # cyclists (bicycle-no-reversing)
    rng = np.random.RandomState(0)
    ids = rng.choice([K.BICYCLE, K.SIMPLE, K.BICYCLE_NO_REVERSING],
                     size=(64, 20), p=[0.6, 0.2, 0.2])
    compound = K.CompoundKinematicModel(
        model_assignments=ids.astype(np.int32), params=sim.kinematic_model.params)
    compound.set_state(sim.kinematic_model.get_state())
    sim.kinematic_model = compound
    step = sc.make_step_fn(render=True, metrics=True, packed_image=True)

    @jax.jit
    def rollout(state):
        def body(s, _):
            s, out = step(s, jnp.zeros((64, 20, 4)))
            return s, _image_sum(out['image'])
        s, acc = jax.lax.scan(body, state, None, length=500)
        return s, jnp.sum(acc)

    dt = timed_steps(rollout, sim.state)
    return {'config': 'heterogeneous_agents_batch64_town10hd',
            'env_steps_per_sec': round(64 * 500 * 3 / dt, 1),
            'image_output': 'packed_rgb8'}


def config4_il_gradients():
    import optax
    from torchdrivesim_tpu.benchmark import build_benchmark_scenario
    from torchdrivesim_tpu.models import BirdviewCNNPolicy
    from torchdrivesim_tpu.rendering.base import Cameras
    from torchdrivesim_tpu.utils import Resolution

    b, horizon, res = 16, 40, 64
    sc = build_benchmark_scenario(batch_size=b, agent_count=8, res=res)
    sim = sc.sim
    sim.renderer.cfg.differentiable = True  # soft rasterizer for gradients
    gen = sim.birdview_mesh_generator
    renderer = sim.renderer
    policy = BirdviewCNNPolicy(action_size=2, features=(16, 32))
    params = policy.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, res, res)))

    def render_ego(state):
        all_state = jnp.concatenate([state.agent_state, state.npc_state], -2)
        present = jnp.concatenate(
            [state.present_mask, state.npc_present_mask], -1)
        mesh = gen.generate(1, all_state[:, None], present[:, None],
                            include_background=False)
        ego = state.agent_state[:, 0]
        cam_xy = ego[:, :2]
        cam_sc = jnp.stack([jnp.sin(ego[:, 2]), jnp.cos(ego[:, 2])], -1)
        return renderer.render_rgb_mesh_chw(
            mesh, Resolution(res, res), Cameras(cam_xy, cam_sc, 2.0 / 70))

    from torchdrivesim_tpu.utils import il_remat_policy

    def loss_fn(params, state):
        # rematerialize each step on the backward pass: storing 40 steps of
        # render + CNN activations needs ~20 GB HBM (v5e has 16); remat
        # trades a second forward pass for O(1)-step live activations.
        # The policy SAVES the two expensive kernel outputs (warp
        # background + rendered frame, ~1.5 MB/step) so the render kernels
        # do not re-run on the backward sweep.
        @functools.partial(jax.checkpoint, policy=il_remat_policy())
        def body(s, _):
            image = render_ego(s)
            act = policy.apply(params, image)
            action = jnp.zeros((b, 8, 2)).at[:, 0].set(act)
            s = sim.functional_step(s, action)
            return s, None
        final, _ = jax.lax.scan(body, state, None, length=horizon)
        return jnp.mean(final.agent_state[:, 0, :2] ** 2)

    from torchdrivesim_tpu.benchmark import sync_pin
    sync_pin()
    grad_fn = jax.jit(jax.grad(loss_fn))
    reps = 10
    for _ in range(3):
        g = grad_fn(params, sim.state)
        float(jax.tree.leaves(g)[0].sum())   # warmup must END IN A FETCH
    t0 = time.perf_counter()
    for _ in range(reps):
        g = grad_fn(params, sim.state)
    float(jax.tree.leaves(g)[0].sum())
    dt = time.perf_counter() - t0

    # ON-HARDWARE gradient check (VERDICT r4 item 5): directional finite
    # difference vs jax.grad through the FULL production train step -- the
    # Mosaic-COMPILED soft-raster + diff-background kernels, not interpret
    # mode. Direction = the gradient itself (maximal signal): then
    # d/de loss(p + e*g/|g|) == |g|. The loss magnitude is map-scale
    # (~1e4 m^2), so f32 rounding of each loss is ~1e-3 absolute; sweep
    # eps upward until the secant clears that noise floor and report the
    # best relative agreement.
    loss_jit = jax.jit(loss_fn)
    # g from the timing loop's last iteration is the same pure function of
    # the same inputs -- reuse it rather than paying another BPTT rollout
    leaves = jax.tree.leaves(g)
    gnorm = float(jnp.sqrt(sum(jnp.sum(l ** 2) for l in leaves)))
    best_rel = float('inf')
    for eps in (3e-3, 1e-2, 3e-2):
        scale = eps / max(gnorm, 1e-12)
        pp = jax.tree.map(lambda p, d: p + scale * d, params, g)
        pm = jax.tree.map(lambda p, d: p - scale * d, params, g)
        fd = (float(loss_jit(pp, sim.state))
              - float(loss_jit(pm, sim.state))) / (2 * eps)
        rel = abs(fd - gnorm) / max(gnorm, 1e-12)
        best_rel = min(best_rel, rel)
    assert best_rel < 0.05, (
        f'on-TPU directional gradcheck drifted: rel err {best_rel:.4f} '
        f'(|g|={gnorm:.4g}) -- compiled soft/warp VJPs disagree with the '
        f'finite difference through the production train step')
    return {'config': 'il_40step_bptt_through_render_batch16',
            'grad_rollouts_per_sec': round(reps / dt, 2),
            'env_steps_per_sec': round(b * horizon * reps / dt, 1),
            'hw_gradcheck_rel_err': round(best_rel, 5),
            'hw_gradcheck_grad_norm': round(gnorm, 4)}


def config5_rl_1024_envs():
    from torchdrivesim_tpu.benchmark import build_benchmark_scenario
    from torchdrivesim_tpu.models import ActorCritic
    b, res = 1024, 64
    sc = build_benchmark_scenario(batch_size=b, agent_count=8, res=res)
    sim = sc.sim
    step = sc.make_step_fn(render=True, metrics=True)
    model = ActorCritic(action_size=2, features=(16, 32))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, res, res)))

    @jax.jit
    def rollout(carry):
        state, key = carry
        def body(c, _):
            s, k = c
            k, sub = jax.random.split(k)
            s, out = step(s, jnp.zeros((b, 8, 2)))
            mean, log_std, value = model.apply(params, out['image'])
            act = mean + jnp.exp(log_std) * jax.random.normal(sub, mean.shape)
            reward = (0.1 * s.agent_state[:, 0, 3]
                      - out['collision'][:, 0] - out['offroad'][:, 0])
            return (s, k), jnp.sum(reward) + jnp.sum(act) * 0 + jnp.sum(value) * 0
        (s, k), acc = jax.lax.scan(body, (state, key), None, length=16)
        return (s, k), jnp.sum(acc)

    from torchdrivesim_tpu.benchmark import sync_pin
    sync_pin()
    carry = (sim.state, jax.random.PRNGKey(0))
    for _ in range(3):
        carry, acc = rollout(carry)
        float(acc)                            # warmup must END IN A FETCH
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        carry, acc = rollout(carry)
    float(acc)
    dt = time.perf_counter() - t0
    return {'config': 'rl_1024_envs_policy_in_loop',
            'env_steps_per_sec': round(b * 16 * reps / dt, 1)}


CONFIGS = {
    'config1': config1_simulate,
    'config2': config2_infractions,
    'config3': config3_heterogeneous,
    'config4': config4_il_gradients,
    'config5': config5_rl_1024_envs,
}


def main(argv=None):
    import subprocess
    argv = sys.argv[1:] if argv is None else argv
    if argv:
        # run the named configs in-process
        results = []
        for name in argv:
            fn = CONFIGS[name]
            try:
                r = fn()
            except Exception as e:  # keep the suite going
                r = {'config': fn.__name__, 'error': str(e)[:200]}
            print(json.dumps(r), flush=True)
            results.append(r)
        return results
    # no args: one SUBPROCESS per config. Sequential in-process runs are
    # unreliable on the tunneled TPU client -- accumulated executables and
    # fetches degrade later configs' dispatch pipelining by up to 5x
    # (measured: the config-3 graph runs at 158k env-steps/s in a fresh
    # process and 24k after configs 1-2 ran in the same process)
    results = []
    for name in CONFIGS:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), name],
            capture_output=True, text=True, timeout=3600)
        for line in proc.stdout.splitlines():
            line = line.strip()
            if line.startswith('{'):
                print(line, flush=True)
                results.append(json.loads(line))
        if proc.returncode != 0 and not any(
                r.get('config', '').startswith(name) for r in results):
            err = (proc.stderr or '')[-300:]
            r = {'config': name, 'error': err}
            print(json.dumps(r), flush=True)
            results.append(r)
    return results


if __name__ == '__main__':
    main()
