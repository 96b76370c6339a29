"""Compare the flat (relayout) vs 2D fused-kernel paths at res=128:
bit-equality on one frame, then scan timing. The 2D path is the DEFAULT
since round 5; TDS_FUSED_FLAT=1 restores the flat path (this script
spawns itself with it set for the flat half)."""
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/tds_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np

B = int(os.environ.get('PF_BATCH', 256))
STEPS = 50


def run_once(tag):
    import torchdrivesim_tpu.ops.pallas_fused as pf
    if os.environ.get('PF_CAMS'):
        pf.CAMS_PER_PROGRAM = int(os.environ['PF_CAMS'])
    packed = os.environ.get('PF_PACKED') == '1'
    from torchdrivesim_tpu.benchmark import build_benchmark_scenario, sync_pin
    from torchdrivesim_tpu.ops.pallas_fused import render_prims_fused_pallas
    from torchdrivesim_tpu.ops.pallas_warp import select_mip
    from torchdrivesim_tpu.ops.rasterize import (
        camera_rows_cols, sort_prims_rowmajor_with_masks)

    sc = build_benchmark_scenario(batch_size=B, agent_count=20, res=128)
    sim = sc.sim
    state = sim.state
    gen = sim.birdview_mesh_generator
    renderer = sim.renderer
    all_state = jnp.concatenate([state.agent_state, state.npc_state], -2)
    present = jnp.concatenate([state.present_mask, state.npc_present_mask], -1)
    lights = state.traffic_control_state['traffic_light']
    mip = select_mip(renderer._mip_pyramid, fov=70.0)
    bg_color = jnp.zeros(3)
    scale = 2.0 / 70

    def render(st):
        quads, qz, qc, tris, tz, tc = gen.generate_prims(
            st, present_mask=present, traffic_light_state=lights)
        ego = st[:, 0]
        cam_xy = ego[:, :2]
        cam_sc = jnp.stack([jnp.sin(ego[:, 2]), jnp.cos(ego[:, 2])], -1)
        b, q = qz.shape
        t = tz.shape[1]
        sq = camera_rows_cols(quads.reshape(b, q * 4, 2), cam_xy, cam_sc,
                              scale, 128).reshape(b, q, 4, 2)
        stt = camera_rows_cols(tris.reshape(b, t * 3, 2), cam_xy, cam_sc,
                               scale, 128).reshape(b, t, 3, 2)
        chunk = int(os.environ.get('PF_CHUNK', '8'))
        sq, qz2, qc2, qm = sort_prims_rowmajor_with_masks(sq, qz, qc, 128, 56,
                                                          4, chunk=chunk)
        stt, tz2, tc2, tm = sort_prims_rowmajor_with_masks(stt, tz, tc, 128,
                                                           56, 4, chunk=chunk)
        return render_prims_fused_pallas(mip, cam_xy, cam_sc, scale, bg_color,
                                         sq, qz2, qc2, stt, tz2, tc2, qm, tm,
                                         packed_output=packed, chunk=chunk)

    img = np.asarray(jax.jit(render)(all_state))
    print(f"{tag} checksum {np.float64(img).sum():.6f} shape {img.shape}",
          flush=True)

    def body(carry, _):
        st = carry + 0.01
        return st, jnp.sum(render(st))

    @jax.jit
    def run(st):
        return jax.lax.scan(body, st, None, length=STEPS)

    sync_pin()
    for _ in range(3):
        out = run(all_state)
        float(jnp.sum(out[1]))
    t0 = time.perf_counter()
    out = run(all_state)
    float(jnp.sum(out[1]))
    dt = (time.perf_counter() - t0) / STEPS * 1000
    print(f"{tag}: {dt:.3f} ms/step (B={B})", flush=True)


if __name__ == '__main__':
    if len(sys.argv) > 1:
        run_once(sys.argv[1])
    else:
        env = dict(os.environ)
        env['TDS_FUSED_FLAT'] = '1'
        subprocess.run([sys.executable, __file__, 'flat'], env=env, check=True)
        env.pop('TDS_FUSED_FLAT')
        subprocess.run([sys.executable, __file__, 'default2d'], env=env,
                       check=True)
