"""
Render a full map to an image (counterpart of the reference
`examples/show_map.py`).

Usage: python examples/show_map.py --map carla_Town02 --out /tmp/map.png
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--map', default='carla_Town02')
    parser.add_argument('--res', type=int, default=1024)
    parser.add_argument('--out', default='/tmp/map.png')
    args = parser.parse_args()

    import imageio
    import numpy as np

    from torchdrivesim_tpu.benchmark import load_or_bake_texture
    from torchdrivesim_tpu.map import find_map_config
    from torchdrivesim_tpu.rendering.base import (
        get_default_color_map, get_default_rendering_levels)

    cfg_map = find_map_config(args.map)
    if cfg_map is None or cfg_map.road_mesh is None:
        raise SystemExit(f"map {args.map} not found or has no mesh")
    texture = load_or_bake_texture(cfg_map, get_default_color_map(),
                                   get_default_rendering_levels())
    img = (np.asarray(texture.data)[::-1] * 255).astype(np.uint8)
    imageio.imwrite(args.out, img)
    print(f"map {args.map}: texture {img.shape[1]}x{img.shape[0]} -> {args.out}")


if __name__ == '__main__':
    main()
