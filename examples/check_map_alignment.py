"""
Map QA: check stopline/lanelet alignment
(counterpart of the reference `examples/check_map_alignment.py`): renders
the map with stopline overlays and reports stoplines oriented against their
lanelet's direction.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--map', default='carla_Town02')
    parser.add_argument('--out', default='/tmp/map_alignment.png')
    args = parser.parse_args()

    import imageio
    import jax.numpy as jnp
    import numpy as np

    from torchdrivesim_tpu.map import find_map_config, find_wrong_way_stoplines
    from torchdrivesim_tpu.mesh import (
        BirdviewMesh, build_verts_faces_from_bounding_box, rendering_mesh)
    from torchdrivesim_tpu.ops.box import box2corners
    from torchdrivesim_tpu.ops.rasterize import bake_background_texture
    from torchdrivesim_tpu.mesh import set_colors_with_defaults
    from torchdrivesim_tpu.rendering.base import (
        get_default_color_map, get_default_rendering_levels)

    cfg_map = find_map_config(args.map)
    wrong = find_wrong_way_stoplines(cfg_map)
    print(f"{args.map}: {len(cfg_map.stoplines)} stoplines, "
          f"{len(wrong)} wrong-way: {wrong}")

    stoplines = cfg_map.stoplines
    mesh = cfg_map.road_mesh
    meshes = [mesh]
    if stoplines:
        pos = jnp.asarray([[ [s.x, s.y, s.length, s.width, s.orientation]
                             for s in stoplines]])
        corners = box2corners(pos)
        verts, faces = build_verts_faces_from_bounding_box(corners[0])
        from torchdrivesim_tpu.mesh import BaseMesh
        meshes.append(rendering_mesh(
            BaseMesh(verts=verts, faces=faces), category='traffic_light_red'))
    combined = BirdviewMesh.concat(meshes)
    rgb = set_colors_with_defaults(combined, get_default_color_map(),
                                   get_default_rendering_levels())
    texture = bake_background_texture(
        rgb.verts[0], rgb.faces[0], rgb.attrs[0],
        background_color=jnp.zeros(3), pixels_per_meter=2.0)
    img = (np.asarray(texture.data)[::-1] * 255).astype(np.uint8)
    imageio.imwrite(args.out, img)
    print(f"wrote {args.out}")


if __name__ == '__main__':
    main()
