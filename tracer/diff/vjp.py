"""Custom VJP for nearest-hit intersection: saved-hit-id replay
(SURVEY.md T6, §3.2 D: "backward: custom VJPs replay intersection with
saved hit-ids (no re-traversal)").

Without this, differentiating the brute tier backpropagates through the
full (R x T) packed intersection — XLA materializes an (R, T) cotangent and
re-runs both matmuls transposed, O(R*T) work and memory. The hit selection
is piecewise constant, so the true derivative only involves each ray's
WINNING triangle: the forward saves the (t, u, v, hit-id) selection, and
the backward replays ONE textbook Moller-Trumbore per ray under jax.vjp and
scatter-adds the three winning-vertex gradients — O(R) work, exact same
gradients as differentiating through the dense path (verified in
tests/grad/test_custom_vjp.py).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from tracer.core.intersect import (intersect_packed, nearest_hit,
                                   moller_trumbore, triangle_affine_maps)
from tracer.core.types import T_FAR


def _forward(o, d, verts, tris, t_min, t_max):
    """(R,3) rays x full scene -> (t (R,), tri (R,) i32, uv (R,2))."""
    ones = jnp.ones(o.shape[:-1] + (1,), o.dtype)
    o4 = jnp.concatenate([o, ones], axis=-1)
    d4 = jnp.concatenate([d, jnp.zeros_like(ones)], axis=-1)
    maps = triangle_affine_maps(verts, tris)
    t, u, v, _ = intersect_packed(o4, d4, maps, t_min, t_max)
    hit = nearest_hit(t, u, v)
    return hit.t, hit.tri, hit.uv


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def intersect_nearest(o, d, verts, tris, t_min=1e-4, t_max=T_FAR):
    """Differentiable nearest-hit with O(R) backward (see module doc)."""
    return _forward(o, d, verts, tris, t_min, t_max)


def _fwd(o, d, verts, tris, t_min, t_max):
    t, tri, uv = _forward(o, d, verts, tris, t_min, t_max)
    return (t, tri, uv), (o, d, verts, tris, tri)


def _replay(o_r, d_r, v0, v1, v2, valid, t_min, t_max):
    """Single-triangle Moller-Trumbore replay for one ray (vmapped).
    Masked invalid (miss) rays contribute exactly zero gradient.

    bary_eps mirrors mt_from_edges (render/tiled.py): the forward pass
    already adjudicated the hit; for rays through a shared edge the saved
    winning triangle can recompute to u ~ -5e-8 classically, and without
    the slack the replay would silently zero that ray's gradient."""
    t, u, v, hit = moller_trumbore(o_r, d_r, v0, v1, v2,
                                   t_min=t_min, t_max=t_max, bary_eps=1e-5)
    ok = hit & valid
    t = jnp.where(ok, t, T_FAR)
    uv = jnp.where(ok, jnp.stack([u, v]), 0.0)
    return t, uv


def _bwd(t_min, t_max, residuals, cts):
    o, d, verts, tris, tri = residuals
    ct_t, _ct_tri, ct_uv = cts
    valid = tri >= 0
    idx = tris[jnp.maximum(tri, 0)]  # (R, 3)
    v0 = verts[idx[:, 0]]
    v1 = verts[idx[:, 1]]
    v2 = verts[idx[:, 2]]

    def one(o_r, d_r, a, b, c, ok, ct_t_r, ct_uv_r):
        _, vjp = jax.vjp(
            lambda *args: _replay(*args, ok, t_min, t_max), o_r, d_r, a, b, c)
        return vjp((ct_t_r, ct_uv_r))

    do, dd, dv0, dv1, dv2 = jax.vmap(one)(o, d, v0, v1, v2, valid, ct_t, ct_uv)
    dverts = jnp.zeros_like(verts)
    sel = jnp.where(valid[:, None], idx, verts.shape[0])  # OOB drop for miss
    dverts = dverts.at[sel[:, 0]].add(dv0, mode="drop")
    dverts = dverts.at[sel[:, 1]].add(dv1, mode="drop")
    dverts = dverts.at[sel[:, 2]].add(dv2, mode="drop")
    dtris = jnp.zeros(tris.shape, jax.dtypes.float0)
    return do, dd, dverts, dtris


intersect_nearest.defvjp(_fwd, _bwd)


def make_replay_tracers(scene, t_min: float = 1e-4):
    """(trace_fn, occlude_fn) with the custom-VJP nearest hit — drop-in for
    render.whitted.make_brute_tracers on single-device differentiable paths
    (used by tracer.diff.fit). NOT for shard_map'd losses: custom_vjp is
    opaque to shard_map's varying-axes inference, so the sharded tiers keep
    the dense-diff tracers (whose collectives the machinery can type)."""
    from tracer.core.intersect import any_hit_brute
    from tracer.core.types import Hit, Ray, RAY_EPS

    def trace(ray: Ray) -> Hit:
        batch = ray.batch_shape
        t, tri, uv = intersect_nearest(
            ray.o.reshape(-1, 3), ray.d.reshape(-1, 3), scene.verts,
            scene.tris, t_min, float(T_FAR))
        return Hit(t=t.reshape(batch), tri=tri.reshape(batch),
                   uv=uv.reshape(batch + (2,)))

    def occlude(ray: Ray, t_max):
        return any_hit_brute(ray, scene.verts, scene.tris, t_min=RAY_EPS,
                             t_max=t_max)

    return trace, occlude
