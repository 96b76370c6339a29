"""Ablate the NON-render side of the benchmark step INSIDE a jitted scan
(isolated timings are dispatch-dominated; see CLAUDE.md). Each variant runs
`functional_step` plus a different subset of the per-step metrics, so the
deltas attribute the "metrics+kinematics+controls+goals" budget.

Usage: python tools/ablate_step.py [variant ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/tds_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp

from torchdrivesim_tpu.benchmark import build_benchmark_scenario, sync_pin
from torchdrivesim_tpu.infractions import compute_collision_matrix
from torchdrivesim_tpu.map_grids import (
    offroad_loss_from_grid, wrong_way_loss_from_grid)
from torchdrivesim_tpu.traffic_controls import red_light_violations

B = int(os.environ.get('AB_BATCH', 256))
STEPS = int(os.environ.get('AB_STEPS', 50))


def main():
    sc = build_benchmark_scenario(batch_size=B, agent_count=20, res=128)
    sim = sc.sim
    sizes = sim.get_all_agent_size()
    light_control = (sim.traffic_controls or {}).get('traffic_light')
    red = light_control.allowed_states.index('red')
    action = jnp.zeros((B, sim.agent_count, 2))

    def boxes_of(state):
        all_state = jnp.concatenate(
            [state.agent_state, state.npc_state], axis=-2)
        present = jnp.concatenate(
            [state.present_mask, state.npc_present_mask], axis=-1)
        return jnp.concatenate(
            [all_state[..., :2], sizes, all_state[..., 2:3]], axis=-1), present

    def tail_none(state):
        return jnp.sum(state.agent_state)

    def tail_collision(state):
        boxes, present = boxes_of(state)
        return jnp.sum(compute_collision_matrix(boxes, present))

    def tail_offroad(state):
        return jnp.sum(offroad_loss_from_grid(
            sim.map_grids, state.agent_state, sim.agent_size,
            threshold=sim.cfg.offroad_threshold))

    def tail_wrongway(state):
        return jnp.sum(wrong_way_loss_from_grid(
            sim.map_grids, state.agent_state))

    # 2D-gather (pre-row-pack) sampler variants for A/B timing
    grids_2d = sim.map_grids.replace(distance_rows=None, direction_rows=None)

    def tail_offroad_2d(state):
        return jnp.sum(offroad_loss_from_grid(
            grids_2d, state.agent_state, sim.agent_size,
            threshold=sim.cfg.offroad_threshold))

    def tail_wrongway_2d(state):
        return jnp.sum(wrong_way_loss_from_grid(grids_2d, state.agent_state))

    def tail_lights(state):
        boxes, _ = boxes_of(state)
        ls = state.traffic_control_state['traffic_light']
        return jnp.sum(red_light_violations(
            boxes[:, :sim.agent_count], light_control.corners, ls,
            red_index=red))

    def tail_all(state):
        return (tail_collision(state) + tail_offroad(state)
                + tail_wrongway(state) + tail_lights(state))

    tails = {'funcstep': tail_none, 'collision': tail_collision,
             'offroad': tail_offroad, 'wrongway': tail_wrongway,
             'offroad_2d': tail_offroad_2d, 'wrongway_2d': tail_wrongway_2d,
             'lights': tail_lights, 'all_metrics': tail_all}
    which = sys.argv[1:] or list(tails)

    for name in which:
        tail = tails[name]

        def body(state, _):
            state = sim.functional_step(state, action)
            return state, tail(state)

        @jax.jit
        def run(st):
            return jax.lax.scan(body, st, None, length=STEPS)

        sync_pin()
        for _ in range(3):
            out = run(sim.state)
            float(jnp.sum(out[1]))
        t0 = time.perf_counter()
        out = run(sim.state)
        float(jnp.sum(out[1]))     # value fetch: true barrier on the tunnel
        dt = (time.perf_counter() - t0) / STEPS * 1000
        print(f"{name}: {dt:.3f} ms/step (B={B})", flush=True)


if __name__ == '__main__':
    main()
