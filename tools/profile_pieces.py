"""Microbenchmark of step/render/metric sub-pieces on the current backend."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/tds_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np

from torchdrivesim_tpu.benchmark import build_benchmark_scenario
from torchdrivesim_tpu.infractions import compute_collision_matrix
from torchdrivesim_tpu.map_grids import offroad_loss_from_grid, wrong_way_loss_from_grid
from torchdrivesim_tpu.ops.rasterize import (
    camera_rows_cols, rasterize_hard, sample_background,
)
from torchdrivesim_tpu.traffic_controls import red_light_violations


def bench(name, fn, *args, reps=20):
    f = jax.jit(fn)
    out = f(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    print(f"{name}: {(time.perf_counter()-t0)/reps*1000:.2f} ms", flush=True)
    return out


def main():
    B, res = 32, 128
    sc = build_benchmark_scenario(batch_size=B, agent_count=20, res=res)
    sim = sc.sim
    state = sim.state
    gen = sim.birdview_mesh_generator
    all_state = jnp.concatenate([state.agent_state, state.npc_state], -2)
    present = jnp.concatenate([state.present_mask, state.npc_present_mask], -1)
    lights = jnp.zeros((B, 24), jnp.int32)

    mesh = bench("generate mesh",
                 lambda s, p, l: gen.generate(1, s[:, None], p[:, None], l,
                                              include_background=False),
                 all_state, present, lights)
    ego = all_state[:, 0]
    cam_xy = ego[:, :2]
    cam_sc = jnp.stack([jnp.sin(ego[:, 2]), jnp.cos(ego[:, 2])], -1)
    tex = sim.renderer.background_texture
    bg = bench("sample_background",
               lambda xy, s: sample_background(tex, xy, s, 2.0 / 70, res,
                                               jnp.zeros(3)),
               cam_xy, cam_sc)

    def rast(verts, faces, attrs, xy, s, bg):
        rc = camera_rows_cols(verts[..., :2], xy, s, 2.0 / 70, res)
        sv = jnp.concatenate([rc, verts[..., 2:3]], -1)
        return rasterize_hard(sv, faces, attrs, res, bg)

    bench("rasterize_hard (108 faces)", rast, mesh.verts, mesh.faces,
          mesh.attrs, cam_xy, cam_sc, bg)

    sizes = sim.get_all_agent_size()
    boxes = jnp.concatenate([all_state[..., :2], sizes, all_state[..., 2:3]], -1)
    bench("collision matrix (discs)", compute_collision_matrix, boxes, present)
    bench("offroad grid",
          lambda s: offroad_loss_from_grid(sim.map_grids, s, sim.agent_size),
          state.agent_state)
    bench("wrongway grid",
          lambda s: wrong_way_loss_from_grid(sim.map_grids, s),
          state.agent_state)
    lc = sim.traffic_controls['traffic_light']
    bench("light violations",
          lambda b, ls: red_light_violations(b[:, :20], lc.corners, ls, 0),
          boxes, lights)


if __name__ == '__main__':
    main()
