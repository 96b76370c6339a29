"""
Convert a Lanelet2 OSM map to the serialized birdview mesh format
(counterpart of the reference `examples/lanelet2_to_birdview_mesh.py`).

Usage:
    python examples/lanelet2_to_birdview_mesh.py --osm path/to/map.osm \
        --out path/to/map_mesh.json --origin 0 0
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--osm', required=True)
    parser.add_argument('--out', required=True)
    parser.add_argument('--origin', nargs=2, type=float, default=(0.0, 0.0))
    parser.add_argument('--left-handed', action='store_true')
    args = parser.parse_args()

    from torchdrivesim_tpu.lanelet2 import (
        lanelet_map_to_lane_mesh, load_lanelet_map, road_mesh_from_lanelet_map)
    from torchdrivesim_tpu.mesh import BirdviewMesh

    lanelet_map = load_lanelet_map(args.osm, origin=tuple(args.origin))
    road = BirdviewMesh.set_properties(
        road_mesh_from_lanelet_map(lanelet_map), category='road')
    lanes = lanelet_map_to_lane_mesh(lanelet_map, left_handed=args.left_handed)
    combined = lanes.merge(road)
    combined.save(args.out)
    print(f"{args.osm}: {combined.verts_count} verts, "
          f"{combined.faces_count} faces -> {args.out}")


if __name__ == '__main__':
    main()
