"""Sharded-geometry tracing (SURVEY.md T11): scene too big for one chip.

Reference parity: none — the OpenCL reference is single-GPU with the whole
scene resident (SURVEY.md §2.1); this is the new multi-chip scope from
BASELINE ("geometry replicated (or sharded for large scenes)").

Design — the ray-tracing analog of ring attention / context parallelism:

  * the device mesh is ('data', 'geom'); rays are sharded over 'data' and
    REPLICATED over 'geom'; triangles are sharded over 'geom' so each device
    holds rays_per_device x tris_per_shard — full parallelism on both axes;
  * `ring_trace_rows`: geometry blocks rotate around the 'geom' ring with
    `lax.ppermute` (the KV-rotation pattern of ring attention) while rays and
    their running nearest-hit state stay put; after G steps every ray has
    seen every triangle. The rotating payload is the packed SHADE ROW
    (v0/e1/e2/normals/material, bvh.cluster.SHADE_COLS layout), so the
    winning hit's attributes arrive with the hit and shading needs no
    cross-device gather afterwards;
  * `reduce_trace_rows`: the barrier alternative — every shard intersects
    its local block once and the winner is combined with two `pmin`s + a
    masked `psum`. Fewer steps (no rotation) but peak = full local result;
    the ring formulation is the one that generalizes to per-step compaction.

Intersection inside the shard uses the dense (R x T_local) brute path (pure
jnp -> runs on CPU test meshes and TPU alike); on TPU the per-shard
intersection can be swapped for the cluster/Pallas tracers without changing
the communication structure.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from tracer.core.camera import Camera, generate_rays
from tracer.core.types import Ray, T_FAR, RAY_EPS, normalize
from tracer.core.intersect import moller_trumbore
from tracer.dist.mesh import DATA_AXIS, GEOM_AXIS
from tracer.render.whitted import WhittedConfig
from tracer.scene.types import Scene

# Rotating per-triangle payload: v0(3) e1(3) e2(3) n0(3) n1(3) n2(3)
# albedo(3) emission(3) mirror(1) valid(1) = 26 cols, padded to 32.
ROW_COLS = 32


def pack_tri_rows(scene: Scene) -> jax.Array:
    """(T, ROW_COLS) per-triangle shade rows (same layout as the cluster
    accel's shade table, minus the sorted-slot ordering)."""
    v = scene.verts
    t = scene.tris
    v0 = v[t[:, 0]]
    e1 = v[t[:, 1]] - v0
    e2 = v[t[:, 2]] - v0
    n0 = scene.normals[t[:, 0]]
    n1 = scene.normals[t[:, 1]]
    n2 = scene.normals[t[:, 2]]
    alb = scene.materials.albedo[scene.mat_id]
    emi = scene.materials.emission[scene.mat_id]
    mir = scene.materials.mirror[scene.mat_id][:, None]
    valid = jnp.ones_like(mir)
    rows = jnp.concatenate([v0, e1, e2, n0, n1, n2, alb, emi, mir, valid], axis=1)
    pad = jnp.zeros((rows.shape[0], ROW_COLS - rows.shape[1]), rows.dtype)
    return jnp.concatenate([rows, pad], axis=1)


def pad_rows_to_shards(rows: jax.Array, n_shards: int) -> jax.Array:
    """Pad the triangle-row table so it splits evenly over `n_shards`;
    padding rows are all-zero (degenerate -> can never hit, valid flag 0)."""
    t = rows.shape[0]
    t_pad = -(-t // n_shards) * n_shards
    if t_pad != t:
        rows = jnp.concatenate(
            [rows, jnp.zeros((t_pad - t, rows.shape[1]), rows.dtype)])
    return rows


def _rows_hit(o, d, rows, t_min, t_max):
    """Rays (R, 3) x triangle rows (T, ROW_COLS) -> (t, best) nearest hit.

    Returns (t (R,), row (R, ROW_COLS)): textbook Moller-Trumbore against
    the row-packed (v0, e1, e2)."""
    v0 = rows[:, 0:3]
    e1 = rows[:, 3:6]
    e2 = rows[:, 6:9]
    t, _, _, hit = moller_trumbore(
        o[:, None, :], d[:, None, :], v0, v0 + e1, v0 + e2,
        t_min=t_min, t_max=t_max)
    t = jnp.where(hit, t, T_FAR)
    # valid flag is column 25 (mirror at 24); mask padding rows.
    t = jnp.where(rows[None, :, 25] > 0.5, t, T_FAR)
    return t


def _nearest_row(t_pairs, rows):
    """(R, T) hit distances + (T, C) rows -> (R,) t_best, (R, C) row_best."""
    idx = jnp.argmin(t_pairs, axis=-1)
    r = jnp.arange(t_pairs.shape[0])
    return t_pairs[r, idx], rows[idx]


def ring_trace_rows(o, d, rows_local, t_min=RAY_EPS, t_max=T_FAR,
                    axis_name: str = GEOM_AXIS):
    """Inside-shard_map ring pass: full nearest hit of local rays against
    ALL geometry shards. Geometry rotates (ppermute); rays stay.

    o, d: (R, 3) local rays. rows_local: (T_shard, ROW_COLS) local block.
    Returns (t_best (R,), row_best (R, ROW_COLS)).
    """
    g = jax.lax.axis_size(axis_name)
    perm = [(i, (i + 1) % g) for i in range(g)]

    # Unrolled Python loop (g is static, small): sidesteps lax.scan's
    # varying-manual-axes carry typing under shard_map and lets XLA overlap
    # each step's ppermute with the next intersection.
    rows = rows_local
    t_best = jnp.full(o.shape[:1], T_FAR, o.dtype)
    row_best = jnp.zeros((o.shape[0], rows_local.shape[1]), o.dtype)
    for step in range(g):
        t_pairs = _rows_hit(o, d, rows, t_min, t_max)
        t_new, row_new = _nearest_row(t_pairs, rows)
        better = t_new < t_best
        t_best = jnp.where(better, t_new, t_best)
        row_best = jnp.where(better[:, None], row_new, row_best)
        if step + 1 < g:
            rows = jax.lax.ppermute(rows, axis_name, perm)
    return t_best, row_best


def ring_any_hit(o, d, rows_local, t_max, t_min=RAY_EPS,
                 axis_name: str = GEOM_AXIS):
    """Inside-shard_map ring occlusion: True where any shard's geometry
    blocks the ray within (t_min, t_max). t_max: (R,) or scalar."""
    g = jax.lax.axis_size(axis_name)
    perm = [(i, (i + 1) % g) for i in range(g)]
    tm = t_max if jnp.ndim(t_max) else jnp.full(o.shape[:1], t_max, o.dtype)

    rows = rows_local
    occ = jnp.zeros(o.shape[:1], bool)
    for step in range(g):
        t_pairs = _rows_hit(o, d, rows, t_min, tm[:, None])
        occ = occ | jnp.any(t_pairs < T_FAR, axis=-1)
        if step + 1 < g:
            rows = jax.lax.ppermute(rows, axis_name, perm)
    return occ


def reduce_any_hit(o, d, rows_local, t_max, t_min=RAY_EPS,
                   axis_name: str = GEOM_AXIS):
    """Barrier occlusion: local any-hit, then a psum-OR over shards.
    Requires rays REPLICATED over `axis_name` (see reduce_trace_rows)."""
    tm = t_max if jnp.ndim(t_max) else jnp.full(o.shape[:1], t_max, o.dtype)
    t_pairs = _rows_hit(o, d, rows_local, t_min, tm[:, None])
    occ = jnp.any(t_pairs < T_FAR, axis=-1)
    return jax.lax.psum(occ.astype(jnp.int32), axis_name) > 0


def reduce_trace_rows(o, d, rows_local, t_min=RAY_EPS, t_max=T_FAR,
                      axis_name: str = GEOM_AXIS):
    """Barrier alternative to the ring: one local intersection, then a
    cross-shard nearest-hit reduction (pmin on t, pmin tie-break on shard
    index, masked psum to fetch the winning row)."""
    t_pairs = _rows_hit(o, d, rows_local, t_min, t_max)
    t_loc, row_loc = _nearest_row(t_pairs, rows_local)
    t_best = jax.lax.pmin(t_loc, axis_name)
    my = jax.lax.axis_index(axis_name)
    eligible = t_loc <= t_best
    win = jax.lax.pmin(jnp.where(eligible, my, jnp.iinfo(jnp.int32).max),
                       axis_name)
    mask = (eligible & (my == win)).astype(row_loc.dtype)
    row_best = jax.lax.psum(row_loc * mask[:, None], axis_name)
    return t_best, row_best


def _shade_rows(scene, o, d, t, rows, occluder, cfg: WhittedConfig):
    """Shade a wavefront from hit rows (shared with the tiled integrator's
    shading model; see render/tiled.py)."""
    found = (t < T_FAR) & (rows[:, 25] > 0.5)
    p = o + t[:, None] * d
    e1 = rows[:, 3:6]
    e2 = rows[:, 6:9]
    if cfg.smooth_shading:
        # Recover barycentrics for normal interpolation.
        from tracer.render.tiled import mt_from_edges

        _, u, v, _ = mt_from_edges(o, d, rows[:, 0:3], e1, e2)
        uu = u[:, None]
        vv = v[:, None]
        n = normalize(rows[:, 9:12] * (1.0 - uu - vv)
                      + rows[:, 12:15] * uu + rows[:, 15:18] * vv)
    else:
        n = normalize(jnp.cross(e1, e2))
    n = jnp.where(jnp.sum(n * d, axis=-1, keepdims=True) > 0, -n, n)
    albedo = rows[:, 18:21]
    emission = rows[:, 21:24]
    mirror = rows[:, 24:25]

    direct = jnp.zeros_like(p)
    for li in range(scene.lights.count):
        lpos = scene.lights.position[li]
        lint = scene.lights.intensity[li]
        to_l = lpos - p
        dist2 = jnp.sum(to_l * to_l, axis=-1)
        dist = jnp.sqrt(jnp.maximum(dist2, 1e-20))
        wi = to_l / dist[:, None]
        cos = jnp.maximum(jnp.sum(n * wi, axis=-1), 0.0)
        occ = occluder(p + n * RAY_EPS, wi, dist - 2 * RAY_EPS)
        vis = jnp.where(occ | ~found, 0.0, 1.0)
        irr = (cos * vis / jnp.maximum(dist2, 1e-20))[:, None] * lint
        direct = direct + albedo / jnp.pi * irr

    local = emission + albedo * cfg.ambient + direct
    return found, p, n, mirror, local


def make_ring_render_fn(scene: Scene, cfg, mesh: jax.sharding.Mesh,
                        use_ring: bool = True):
    """Jitted (scene, camera) -> (H, W, 3) with geometry sharded over 'geom'.

    Ray placement differs per variant:
      * ring (use_ring=True): rays are sharded over BOTH mesh axes
        (('data','geom') flattened) — every device traces a distinct ray
        block while geometry blocks rotate around the 'geom' ring past it.
        Full compute parallelism on all devices; communication = G-1
        ppermutes of the geometry block per trace.
      * reduce (use_ring=False): rays sharded over 'data' and replicated
        over 'geom'; each device intersects its rays against its resident
        shard once and winners combine with pmin/psum collectives.
    """
    g = mesh.shape[GEOM_AXIS]
    wcfg = WhittedConfig(max_bounces=cfg.max_bounces,
                         smooth_shading=cfg.smooth_shading)
    H, W = cfg.height, cfg.width
    ray_spec = P((DATA_AXIS, GEOM_AXIS)) if use_ring else P(DATA_AXIS)

    def body(o_flat, d_flat, rows_shard):
        # Per-device: (R_local, 3) rays, (T/g, ROW_COLS) triangle rows.
        sky = jnp.asarray(wcfg.sky_color, jnp.float32)
        radiance = jnp.zeros(o_flat.shape, jnp.float32)
        throughput = jnp.ones(o_flat.shape, jnp.float32)
        live = jnp.ones(o_flat.shape[:1], bool)
        o, d = o_flat, d_flat

        if use_ring:
            trace = ring_trace_rows
            occluder = lambda so, sd, tmax: ring_any_hit(
                so, sd, rows_shard, tmax)
        else:
            trace = reduce_trace_rows
            occluder = lambda so, sd, tmax: reduce_any_hit(
                so, sd, rows_shard, tmax)

        for bounce in range(wcfg.max_bounces):
            t, rows = trace(o, d, rows_shard)
            found, p, n, mirror, local = _shade_rows(
                scene, o, d, t, rows, occluder, wcfg)
            valid = found & live
            miss = jnp.where((live & ~found)[:, None], sky, 0.0)
            surf = jnp.where(valid[:, None], local * (1.0 - mirror), 0.0)
            radiance = radiance + throughput * (surf + miss)
            if bounce + 1 < wcfg.max_bounces:
                refl = d - 2.0 * jnp.sum(d * n, axis=-1, keepdims=True) * n
                o = p + n * RAY_EPS
                d = normalize(refl)
                throughput = throughput * mirror
                live = valid & (mirror[:, 0] > 0.0)
        return radiance

    shard_body = jax.shard_map(
        body, mesh=mesh,
        in_specs=(ray_spec, ray_spec, P(GEOM_AXIS)),
        out_specs=ray_spec,
    )

    @jax.jit
    def run(scene: Scene, camera: Camera) -> jax.Array:
        rows = pad_rows_to_shards(pack_tri_rows(scene), g)
        rays = generate_rays(camera, H, W)
        o = rays.o.reshape(-1, 3)
        d = rays.d.reshape(-1, 3)
        img = shard_body(o, d, rows)
        return img.reshape(H, W, 3)

    return run
