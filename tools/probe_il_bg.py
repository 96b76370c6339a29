"""Probe: is config 4 (IL gradients) dominated by the differentiable
background gather (`sample_background`, 12 gathered floats per pixel)?

Times three variants of the 40-step BPTT rollout at batch 16, res 64:
  A. baseline: soft render with bilinear-sampled background (the bench path)
  B. no-texture: constant background color (removes ALL background gathers)
  C. forward-only rollout (no grad) of A, for forward/backward split.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/tds_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def build(no_texture: bool):
    from torchdrivesim_tpu.benchmark import build_benchmark_scenario
    from torchdrivesim_tpu.models import BirdviewCNNPolicy
    from torchdrivesim_tpu.rendering.base import Cameras
    from torchdrivesim_tpu.utils import Resolution

    b, horizon, res = 16, 40, 64
    sc = build_benchmark_scenario(batch_size=b, agent_count=8, res=res)
    sim = sc.sim
    sim.renderer.cfg.differentiable = True
    if no_texture:
        sim.renderer.background_texture = None
        sim.renderer._packed_texture = None
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

    def loss_fn(params, state):
        @jax.checkpoint
        def body(s, _):
            image = render_ego(s)
            act = policy.apply(params, image)
            action = jnp.zeros((b, 8, 2)).at[:, 0].set(act)
            s = sim.functional_step(s, action)
            return s, None
        final, _ = jax.lax.scan(body, state, None, length=horizon)
        return jnp.mean(final.agent_state[:, 0, :2] ** 2)

    return sim, params, loss_fn


def timeit(fn, *args, n=3):
    out = fn(*args)
    float(jax.tree.leaves(out)[0].sum())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(jax.tree.leaves(out)[0].sum())
    return (time.perf_counter() - t0) / n


def main():
    from torchdrivesim_tpu.benchmark import sync_pin
    sync_pin()
    sim, params, loss_fn = build(no_texture=False)
    grad_fn = jax.jit(jax.grad(loss_fn))
    fwd_fn = jax.jit(loss_fn)
    t_grad = timeit(grad_fn, params, sim.state)
    t_fwd = timeit(fwd_fn, params, sim.state)
    print(f"A grad  (textured bg): {t_grad*1e3:8.1f} ms/rollout "
          f"({1/t_grad:.2f}/s)")
    print(f"C fwd   (textured bg): {t_fwd*1e3:8.1f} ms/rollout")

    sim2, params2, loss2 = build(no_texture=True)
    grad2 = jax.jit(jax.grad(loss2))
    fwd2 = jax.jit(loss2)
    t_grad2 = timeit(grad2, params2, sim2.state)
    t_fwd2 = timeit(fwd2, params2, sim2.state)
    print(f"B grad  (const bg):    {t_grad2*1e3:8.1f} ms/rollout "
          f"({1/t_grad2:.2f}/s)")
    print(f"  fwd   (const bg):    {t_fwd2*1e3:8.1f} ms/rollout")


if __name__ == '__main__':
    main()
