from tracer.bvh.cluster import ClusterAccel, build_clusters, build_scene_accel, CLUSTER_SIZE
from tracer.bvh.cull import cull_clusters, frustum_aabb_feasible, tile_bounds
from tracer.bvh.morton import morton3d, morton_decode3d, quantize_positions

__all__ = [
    "ClusterAccel", "build_clusters", "build_scene_accel", "CLUSTER_SIZE",
    "cull_clusters", "frustum_aabb_feasible", "tile_bounds",
    "morton3d", "morton_decode3d", "quantize_positions",
]
