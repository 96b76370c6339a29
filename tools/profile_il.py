"""
Split the IL benchmark (suite config 4: 40-step BPTT through the soft
renderer, batch 16, res 64) into forward / backward / optimizer-update
costs, measured as same-process DELTAS (the only honest attribution on the
tunneled client -- see BENCH_NOTES.md "Timing on the axon tunnel").

Variants timed (each jitted separately, warmed up to a value fetch):
  fwd    : loss_fn only
  grad   : value_and_grad(loss_fn)          -> backward = grad - fwd
  train  : grad + adam update               -> update   = train - grad
  nopol  : rollout loss WITHOUT the CNN policy (zero actions) under grad
           -> policy fwd+bwd = grad - nopol
  norender: grad with the render replaced by a zeros image
           -> render fwd+bwd = grad - norender
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

jax.config.update("jax_compilation_cache_dir", "/tmp/tds_tpu_jax_cache")

from torchdrivesim_tpu.benchmark import build_benchmark_scenario, sync_pin
from torchdrivesim_tpu.models import BirdviewCNNPolicy
from torchdrivesim_tpu.utils import il_remat_policy
from torchdrivesim_tpu.rendering.base import Cameras
from torchdrivesim_tpu.utils import Resolution

B, HORIZON, RES, AGENTS = 16, 40, 64, 8
REPS = int(os.environ.get("IL_REPS", "10"))


def main():
    sc = build_benchmark_scenario(batch_size=B, agent_count=AGENTS, res=RES)
    sim = sc.sim
    sim.renderer.cfg.differentiable = True
    gen = sim.birdview_mesh_generator
    renderer = sim.renderer
    policy = BirdviewCNNPolicy(action_size=2, features=(16, 32))
    params = policy.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, RES, RES)))
    tx = optax.adam(3e-4)
    opt_state = tx.init(params)

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
            mesh, Resolution(RES, RES), Cameras(cam_xy, cam_sc, 2.0 / 70))

    def make_loss(use_policy=True, use_render=True):
        def loss_fn(params, state):
            @functools.partial(jax.checkpoint, policy=il_remat_policy())
            def body(s, _):
                if use_render:
                    image = render_ego(s)
                else:
                    # must depend on the carry or LICM hoists the CNN
                    image = jnp.zeros((B, 3, RES, RES)) + \
                        1e-6 * s.agent_state.mean()
                if use_policy:
                    act = policy.apply(params, image)
                else:
                    act = jnp.zeros((B, 2)) + 1e-6 * image.mean()
                action = jnp.zeros((B, AGENTS, 2)).at[:, 0].set(act)
                s = sim.functional_step(s, action)
                return s, None
            final, _ = jax.lax.scan(body, state, None, length=HORIZON)
            return jnp.mean(final.agent_state[:, 0, :2] ** 2)
        return loss_fn

    loss_fn = make_loss()

    def train_step(params, opt_state, state):
        loss, grads = jax.value_and_grad(loss_fn)(params, state)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    # NOTE: ablation variants are timed as FORWARD LOSS VALUES, not grads --
    # jax.grad returns only the gradient, so a variant whose params are
    # unused has a structurally-zero grad and XLA DCEs the whole rollout
    # (measured: a "no-policy" grad variant times at the empty-scan floor).
    variants = {
        "fwd": jax.jit(loss_fn),
        "grad": jax.jit(jax.grad(loss_fn)),
        "train": jax.jit(train_step),
        "fwd_nopol": jax.jit(make_loss(use_policy=False)),
        "fwd_norender": jax.jit(make_loss(use_render=False)),
    }

    if os.environ.get("IL_NOBG"):
        # solid background color instead of the textured-bilinear sample:
        # the delta against fwd/grad attributes the background-gather cost
        renderer.background_texture = None
        renderer._quad_texture = None
        variants = {
            "fwd_nobg": jax.jit(make_loss()),
            "grad_nobg": jax.jit(jax.grad(make_loss())),
        }

    sync_pin()
    state = sim.state
    results = {}
    for name, fn in variants.items():
        args = ((params, opt_state, state) if name == "train"
                else (params, state))
        for _ in range(3):
            out = fn(*args)
            float(jax.tree.leaves(out)[0].sum())   # warmup ends in a FETCH
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = fn(*args)
        float(jax.tree.leaves(out)[0].sum())
        dt = (time.perf_counter() - t0) / REPS
        results[name] = dt
        print(f"{name:9s} {dt * 1000:8.2f} ms/rollout   "
              f"{1.0 / dt:6.2f} rollouts/s", flush=True)

    g, f = results["grad"], results["fwd"]
    print(f"\nsplit @ B={B} H={HORIZON} res={RES}:")
    print(f"  forward        {f*1000:8.2f} ms")
    print(f"  backward       {(g - f)*1000:8.2f} ms  (grad - fwd)")
    print(f"  optimizer      {(results['train'] - g)*1000:8.2f} ms  (train - grad)")
    print(f"  fwd policy     {(f - results['fwd_nopol'])*1000:8.2f} ms  (fwd - fwd_nopol)")
    print(f"  fwd render     {(f - results['fwd_norender'])*1000:8.2f} ms  (fwd - fwd_norender)")


if __name__ == "__main__":
    main()
