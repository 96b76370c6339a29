"""Decompose the IL (config 4) step cost: forward and backward times for
each piece in isolation — soft rasterizer, CNN policy, sim dynamics step,
and the composed body — at the bench shapes (b=16, res=64, F=24)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/tds_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def timeit(fn, *args, n=30):
    out = fn(*args)
    float(jax.tree.leaves(out)[0].sum())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(jax.tree.leaves(out)[0].sum())
    return (time.perf_counter() - t0) / n * 1e3


def main():
    from torchdrivesim_tpu.benchmark import build_benchmark_scenario, sync_pin
    from torchdrivesim_tpu.models import BirdviewCNNPolicy
    from torchdrivesim_tpu.ops.rasterize import rasterize_softmax
    from torchdrivesim_tpu.rendering.base import Cameras
    from torchdrivesim_tpu.utils import Resolution

    sync_pin()
    b, res = 16, 64
    sc = build_benchmark_scenario(batch_size=b, agent_count=8, res=res)
    sim = sc.sim
    sim.renderer.cfg.differentiable = True
    gen, renderer = sim.birdview_mesh_generator, sim.renderer
    state = sim.state

    # piece 1: softmax rasterizer (mesh gen + raster, no background texture)
    def raster_loss(agent_state):
        s = state.replace(agent_state=agent_state)
        all_state = jnp.concatenate([s.agent_state, s.npc_state], -2)
        present = jnp.concatenate([s.present_mask, s.npc_present_mask], -1)
        mesh = gen.generate(1, all_state[:, None], present[:, None],
                            include_background=False)
        from torchdrivesim_tpu.ops.rasterize import camera_rows_cols
        ego = s.agent_state[:, 0]
        cam_xy, cam_sc = ego[:, :2], jnp.stack(
            [jnp.sin(ego[:, 2]), jnp.cos(ego[:, 2])], -1)
        rc = camera_rows_cols(mesh.verts[..., :2], cam_xy, cam_sc,
                              2.0 / 70, res)
        sv = jnp.concatenate([rc, mesh.verts[..., 2:3]], axis=-1)
        bgc = jnp.zeros((b, res, res, 3))
        img = rasterize_softmax(sv, mesh.faces, mesh.attrs, res, bgc)
        return jnp.mean(img * jnp.linspace(0, 1, res)[None, :, None, None])

    # piece 2: CNN policy
    policy = BirdviewCNNPolicy(action_size=2, features=(16, 32))
    params = policy.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, res, res)))
    image = jnp.ones((b, 3, res, res))

    def cnn_loss(params, image):
        return jnp.mean(policy.apply(params, image) ** 2)

    # piece 3: sim dynamics step (no render)
    def dyn_loss(agent_state):
        s = state.replace(agent_state=agent_state)
        s = sim.functional_step(s, jnp.zeros((b, 8, 2)))
        return jnp.mean(s.agent_state[..., :2] ** 2)

    # piece 4: full body (quad background + raster + CNN + step)
    def render_ego(s):
        all_state = jnp.concatenate([s.agent_state, s.npc_state], -2)
        present = jnp.concatenate([s.present_mask, s.npc_present_mask], -1)
        mesh = gen.generate(1, all_state[:, None], present[:, None],
                            include_background=False)
        ego = s.agent_state[:, 0]
        cam_sc = jnp.stack([jnp.sin(ego[:, 2]), jnp.cos(ego[:, 2])], -1)
        return renderer.render_rgb_mesh_chw(
            mesh, Resolution(res, res), Cameras(ego[:, :2], cam_sc, 2.0 / 70))

    def body_loss(params, agent_state):
        s = state.replace(agent_state=agent_state)
        img = render_ego(s)
        act = policy.apply(params, img)
        action = jnp.zeros((b, 8, 2)).at[:, 0].set(act)
        s = sim.functional_step(s, action)
        return jnp.mean(s.agent_state[..., :2] ** 2)

    pieces = [
        ("raster fwd", jax.jit(raster_loss), (state.agent_state,)),
        ("raster grad", jax.jit(jax.grad(raster_loss)), (state.agent_state,)),
        ("cnn fwd", jax.jit(cnn_loss), (params, image)),
        ("cnn grad", jax.jit(jax.grad(cnn_loss, argnums=(0, 1))),
         (params, image)),
        ("dyn fwd", jax.jit(dyn_loss), (state.agent_state,)),
        ("dyn grad", jax.jit(jax.grad(dyn_loss)), (state.agent_state,)),
        ("body fwd", jax.jit(body_loss), (params, state.agent_state)),
        ("body grad", jax.jit(jax.grad(body_loss, argnums=(0, 1))),
         (params, state.agent_state)),
    ]
    for name, fn, args in pieces:
        print(f"{name:12s} {timeit(fn, *args):7.3f} ms")


if __name__ == '__main__':
    main()
