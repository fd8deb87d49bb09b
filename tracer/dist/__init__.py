from tracer.dist.mesh import make_render_mesh, init_multihost, DATA_AXIS, GEOM_AXIS
from tracer.dist.ray_dp import make_sharded_render_fn, make_sharded_grad_fn, shard_rays

__all__ = [
    "make_render_mesh", "init_multihost", "DATA_AXIS", "GEOM_AXIS",
    "make_sharded_render_fn", "make_sharded_grad_fn", "shard_rays",
]
