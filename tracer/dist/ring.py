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

Intersection inside the shard has two tiers sharing the same communication
structure (proved equal in tests/dist/test_sharding.py):

  * brute rows (`_rows_hit`): dense (R x T_local) — small scenes/tests;
  * cluster accel (`build_rows_accel` + `accel_trace_rows`): each shard's
    row block is morton-clustered into a shard-local ClusterAccel and rays
    are tile-culled against it (bvh.cull + kernels.trace_tiles_jnp), so the
    per-shard cost is O(R x candidates x C) instead of O(R x T/g) — the
    tier that scales to the 1M-tri pod config (BASELINE config 5). The
    accel pytree is what rotates around the ring.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from tracer.core.camera import Camera, generate_rays
from tracer.core.types import Ray, T_FAR, RAY_EPS, normalize
from tracer.core.intersect import moller_trumbore
from tracer.dist.mesh import DATA_AXIS, GEOM_AXIS
from tracer.render.whitted import WhittedConfig
from tracer.scene.types import Scene

# Rotating per-triangle payload: v0(3) e1(3) e2(3) n0(3) n1(3) n2(3)
# albedo(3) emission(3) mirror(1) valid(1) specular(1) shininess(1)
# = 28 cols, padded to 32 (cols 24/25/26/27 match bvh.cluster.SHADE_COLS).
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
    spec = scene.materials.specular[scene.mat_id][:, None]
    shin = scene.materials.shininess[scene.mat_id][:, None]
    valid = jnp.ones_like(mir)
    rows = jnp.concatenate([v0, e1, e2, n0, n1, n2, alb, emi, mir, valid,
                            spec, shin], axis=1)
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


# ---------------------------------------------------------------------------
# Cluster-accel tier: shard-local acceleration structure built FROM the
# rotating row blocks, so the ring comm pattern is unchanged.
# ---------------------------------------------------------------------------

def build_rows_accel(rows: jax.Array, cluster_size: int | None = None):
    """(T_shard, ROW_COLS) row block -> shard-local ClusterAccel (jittable,
    vmap-able over shards). The accel's shade table IS the morton-permuted
    row block, and tri_ids are sorted-slot ids indexing straight into it."""
    from tracer.bvh.cluster import CLUSTER_SIZE, SUPER_FACTOR, ClusterAccel
    from tracer.bvh.morton import morton3d, quantize_positions
    from tracer.core.intersect import triangle_affine_maps

    C = cluster_size or CLUSTER_SIZE
    T = rows.shape[0]
    v0 = rows[:, 0:3]
    v1 = v0 + rows[:, 3:6]
    v2 = v0 + rows[:, 6:9]
    tri_lo = jnp.minimum(jnp.minimum(v0, v1), v2)
    tri_hi = jnp.maximum(jnp.maximum(v0, v1), v2)
    real = rows[:, 25] > 0.5  # padding rows must not skew the morton grid
    centroid = jax.lax.stop_gradient(0.5 * (tri_lo + tri_hi))
    big = jnp.float32(T_FAR)
    scene_lo = jnp.min(jnp.where(real[:, None], centroid, big), axis=0)
    scene_hi = jnp.max(jnp.where(real[:, None], centroid, -big), axis=0)
    codes = morton3d(quantize_positions(centroid, scene_lo, scene_hi))
    # Sort padding rows to the back so real triangles stay densely packed.
    codes = jnp.where(real, codes, jnp.uint32(0xFFFFFFFF))
    order = jnp.argsort(codes).astype(jnp.int32)

    n_cl = -(-T // C)
    n_pad = n_cl * C
    order_p = jnp.concatenate(
        [order, jnp.zeros((n_pad - T,), jnp.int32)]) if n_pad != T else order
    slot_valid = ((jnp.arange(n_pad, dtype=jnp.int32) < T)
                  & (rows[order_p, 25] > 0.5))

    verts = jnp.stack([v0, v1, v2], axis=1).reshape(-1, 3)
    tris = jnp.arange(3 * T, dtype=jnp.int32).reshape(T, 3)
    maps = triangle_affine_maps(verts, tris)[order_p]
    maps = jnp.where(slot_valid[:, None, None], maps, 0.0)
    mc = maps.reshape(n_cl, C, 3, 4)
    w = jnp.concatenate([mc[:, :, 0, :], mc[:, :, 1, :], mc[:, :, 2, :]],
                        axis=1)
    tri_w = jnp.transpose(w, (0, 2, 1))  # (Ncl, 4, 3C)

    tri_ids = jnp.where(slot_valid, jnp.arange(n_pad, dtype=jnp.int32),
                        -1).reshape(n_cl, C)
    lo_p = jnp.where(slot_valid[:, None], tri_lo[order_p], big).reshape(n_cl, C, 3)
    hi_p = jnp.where(slot_valid[:, None], tri_hi[order_p], -big).reshape(n_cl, C, 3)
    cluster_lo = jax.lax.stop_gradient(jnp.min(lo_p, axis=1))
    cluster_hi = jax.lax.stop_gradient(jnp.max(hi_p, axis=1))
    n_sc = -(-n_cl // SUPER_FACTOR)
    pad_sc = n_sc * SUPER_FACTOR - n_cl
    sc_lo = jnp.concatenate(
        [cluster_lo, jnp.full((pad_sc, 3), big)]).reshape(n_sc, SUPER_FACTOR, 3)
    sc_hi = jnp.concatenate(
        [cluster_hi, jnp.full((pad_sc, 3), -big)]).reshape(n_sc, SUPER_FACTOR, 3)

    shade = jnp.where(slot_valid[:, None], rows[order_p], 0.0)
    return ClusterAccel(
        tri_w=tri_w, tri_ids=tri_ids,
        cluster_lo=cluster_lo, cluster_hi=cluster_hi,
        super_lo=jnp.min(sc_lo, axis=1), super_hi=jnp.max(sc_hi, axis=1),
        shade=shade)


_RING_K_CAP = 64
_RING_TR = 64


def accel_trace_rows(o, d, accel, t_min=RAY_EPS, t_max=T_FAR,
                     k_cap: int | None = _RING_K_CAP):
    """Shard-local nearest hit via the cluster accel:
    (t (R,), row (R, C), excess () int32 — cull candidates dropped by the
    k-cap; nonzero means this shard silently skipped geometry and the
    caller must surface it (VERDICT r3 weak #3)). k_cap=None disables the
    cap (exact: every surviving candidate is intersected)."""
    from tracer.bvh.cull import cull_clusters
    from tracer.kernels import tile_rays, trace_tiles_jnp, untile

    o_t, d_t, tiling = tile_rays(o, d, _RING_TR)
    k = accel.num_clusters if k_cap is None else min(k_cap, accel.num_clusters)
    cand, counts, excess = cull_clusters(accel, o_t, d_t, t_max, k)
    bt, bslot, _, _ = trace_tiles_jnp(o_t, d_t, accel, cand, counts,
                                      t_min=t_min)
    t = untile(bt, tiling)
    slot = untile(bslot, tiling)
    row = accel.shade[jnp.maximum(slot, 0)]
    row = jnp.where((slot >= 0)[:, None], row, 0.0)
    return jnp.where(slot >= 0, t, T_FAR), row, excess


def accel_any_hit(o, d, accel, t_max, t_min=RAY_EPS,
                  k_cap: int | None = _RING_K_CAP):
    """Shard-local occlusion via the cluster accel: ((R,) bool, excess)."""
    from tracer.bvh.cull import cull_clusters
    from tracer.kernels import any_hit_tiles_jnp, tile_rays, untile

    tm = t_max if jnp.ndim(t_max) else jnp.full(o.shape[:1], t_max, o.dtype)
    o_t, d_t, tiling = tile_rays(o, d, _RING_TR)
    tm3 = jnp.broadcast_to(tm[:, None], tm.shape + (3,))
    tm_t, _, _ = tile_rays(tm3, tm3, _RING_TR)
    tm_t = tm_t[..., 0]
    k = accel.num_clusters if k_cap is None else min(k_cap, accel.num_clusters)
    cand, counts, excess = cull_clusters(accel, o_t, d_t, tm_t, k)
    occ = any_hit_tiles_jnp(o_t, d_t, tm_t, accel, cand, counts, t_min=t_min)
    return untile(occ, tiling), excess


def _tree_ppermute(tree, axis_name, perm):
    return jax.tree_util.tree_map(
        lambda x: jax.lax.ppermute(x, axis_name, perm), tree)


def _rows_trace_local(o, d, rows, t_min, t_max):
    t_pairs = _rows_hit(o, d, rows, t_min, t_max)
    t_best, row_best = _nearest_row(t_pairs, rows)
    return t_best, row_best, jnp.int32(0)  # brute tier: exact, no k-cap


def _rows_any_local(o, d, rows, t_min, tm):
    t_pairs = _rows_hit(o, d, rows, t_min, tm[:, None])
    return jnp.any(t_pairs < T_FAR, axis=-1), jnp.int32(0)


def _ring_closest(o, d, local, local_trace, row_cols, axis_name):
    """Generic ring pass: `local` (rows block OR accel pytree) rotates via
    ppermute; rays + running nearest-hit state stay put. Returns
    (t_best, row_best, excess) with excess summed over the ring steps
    (per-device; callers psum it over shards for the global count)."""
    g = jax.lax.axis_size(axis_name)
    perm = [(i, (i + 1) % g) for i in range(g)]

    # Unrolled Python loop (g is static, small): sidesteps lax.scan's
    # varying-manual-axes carry typing under shard_map and lets XLA overlap
    # each step's ppermute with the next intersection.
    cur = local
    t_best = jnp.full(o.shape[:1], T_FAR, o.dtype)
    row_best = jnp.zeros((o.shape[0], row_cols), o.dtype)
    excess = jnp.int32(0)
    for step in range(g):
        t_new, row_new, exc = local_trace(o, d, cur)
        excess = excess + exc
        better = t_new < t_best
        t_best = jnp.where(better, t_new, t_best)
        row_best = jnp.where(better[:, None], row_new, row_best)
        if step + 1 < g:
            cur = _tree_ppermute(cur, axis_name, perm)
    return t_best, row_best, excess


def _ring_any(o, d, local, local_any, axis_name):
    g = jax.lax.axis_size(axis_name)
    perm = [(i, (i + 1) % g) for i in range(g)]
    cur = local
    occ = jnp.zeros(o.shape[:1], bool)
    excess = jnp.int32(0)
    for step in range(g):
        occ_new, exc = local_any(o, d, cur)
        occ = occ | occ_new
        excess = excess + exc
        if step + 1 < g:
            cur = _tree_ppermute(cur, axis_name, perm)
    return occ, excess


def ring_trace_rows(o, d, rows_local, t_min=RAY_EPS, t_max=T_FAR,
                    axis_name: str = GEOM_AXIS):
    """Inside-shard_map ring pass: full nearest hit of local rays against
    ALL geometry shards. Geometry rotates (ppermute); rays stay.

    o, d: (R, 3) local rays. rows_local: (T_shard, ROW_COLS) local block.
    Returns (t_best (R,), row_best (R, ROW_COLS), excess () int32).
    """
    return _ring_closest(
        o, d, rows_local,
        lambda o_, d_, rows: _rows_trace_local(o_, d_, rows, t_min, t_max),
        rows_local.shape[1], axis_name)


def ring_trace_accel(o, d, accel_local, t_min=RAY_EPS, t_max=T_FAR,
                     axis_name: str = GEOM_AXIS,
                     k_cap: int | None = _RING_K_CAP):
    """Ring pass with the shard-local cluster accel rotating instead of raw
    rows (same comm structure; per-shard cost drops to candidates x C)."""
    return _ring_closest(
        o, d, accel_local,
        lambda o_, d_, a: accel_trace_rows(o_, d_, a, t_min, t_max, k_cap),
        accel_local.shade.shape[-1], axis_name)


def ring_any_hit(o, d, rows_local, t_max, t_min=RAY_EPS,
                 axis_name: str = GEOM_AXIS):
    """Inside-shard_map ring occlusion: (occ (R,) bool, excess () int32);
    occ True where any shard's geometry blocks the ray within
    (t_min, t_max). t_max: (R,) or scalar."""
    tm = t_max if jnp.ndim(t_max) else jnp.full(o.shape[:1], t_max, o.dtype)
    return _ring_any(
        o, d, rows_local,
        lambda o_, d_, rows: _rows_any_local(o_, d_, rows, t_min, tm),
        axis_name)


def ring_any_hit_accel(o, d, accel_local, t_max, t_min=RAY_EPS,
                       axis_name: str = GEOM_AXIS,
                       k_cap: int | None = _RING_K_CAP):
    tm = t_max if jnp.ndim(t_max) else jnp.full(o.shape[:1], t_max, o.dtype)
    return _ring_any(
        o, d, accel_local,
        lambda o_, d_, a: accel_any_hit(o_, d_, a, tm, t_min, k_cap),
        axis_name)


def reduce_any_hit(o, d, rows_local, t_max, t_min=RAY_EPS,
                   axis_name: str = GEOM_AXIS):
    """Barrier occlusion: local any-hit, then a psum-OR over shards.
    Requires rays REPLICATED over `axis_name` (see reduce_trace_rows)."""
    tm = t_max if jnp.ndim(t_max) else jnp.full(o.shape[:1], t_max, o.dtype)
    t_pairs = _rows_hit(o, d, rows_local, t_min, tm[:, None])
    occ = jnp.any(t_pairs < T_FAR, axis=-1)
    return jax.lax.psum(occ.astype(jnp.int32), axis_name) > 0, jnp.int32(0)


def _reduce_merge(t_loc, row_loc, axis_name):
    """Cross-shard nearest-hit reduction: pmin on t, pmin tie-break on shard
    index, masked psum to fetch the winning row."""
    t_best = jax.lax.pmin(t_loc, axis_name)
    my = jax.lax.axis_index(axis_name)
    eligible = t_loc <= t_best
    win = jax.lax.pmin(jnp.where(eligible, my, jnp.iinfo(jnp.int32).max),
                       axis_name)
    mask = (eligible & (my == win)).astype(row_loc.dtype)
    row_best = jax.lax.psum(row_loc * mask[:, None], axis_name)
    return t_best, row_best


def reduce_trace_rows(o, d, rows_local, t_min=RAY_EPS, t_max=T_FAR,
                      axis_name: str = GEOM_AXIS):
    """Barrier alternative to the ring: one local intersection, then the
    cross-shard nearest-hit reduction."""
    t_pairs = _rows_hit(o, d, rows_local, t_min, t_max)
    t_loc, row_loc = _nearest_row(t_pairs, rows_local)
    t_best, row_best = _reduce_merge(t_loc, row_loc, axis_name)
    return t_best, row_best, jnp.int32(0)


def reduce_trace_accel(o, d, accel_local, t_min=RAY_EPS, t_max=T_FAR,
                       axis_name: str = GEOM_AXIS,
                       k_cap: int | None = _RING_K_CAP):
    t_loc, row_loc, excess = accel_trace_rows(o, d, accel_local, t_min, t_max,
                                              k_cap)
    t_best, row_best = _reduce_merge(t_loc, row_loc, axis_name)
    return t_best, row_best, excess


def reduce_any_hit_accel(o, d, accel_local, t_max, t_min=RAY_EPS,
                         axis_name: str = GEOM_AXIS,
                         k_cap: int | None = _RING_K_CAP):
    occ, excess = accel_any_hit(o, d, accel_local, t_max, t_min, k_cap)
    return jax.lax.psum(occ.astype(jnp.int32), axis_name) > 0, excess


def _shade_rows(lights_pos, lights_int, o, d, t, rows, occluder,
                cfg: WhittedConfig):
    """Shade a wavefront from hit rows (shared with the tiled integrator's
    shading model; see render/tiled.py). Light arrays are explicit arguments
    (NOT a captured scene) so callers that re-run with updated lights shade
    with the new data. `occluder(o, wi, t_max) -> (occ, excess)`; the summed
    excess is returned so the caller can surface shadow-pass cull overflow."""
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
    spec = rows[:, 26]
    shin = rows[:, 27]

    from tracer.render.whitted import phong_specular

    direct = jnp.zeros_like(p)
    excess = jnp.int32(0)
    for li in range(lights_pos.shape[0]):
        lpos = lights_pos[li]
        lint = lights_int[li]
        to_l = lpos - p
        dist2 = jnp.sum(to_l * to_l, axis=-1)
        dist = jnp.sqrt(jnp.maximum(dist2, 1e-20))
        wi = to_l / dist[:, None]
        cos = jnp.maximum(jnp.sum(n * wi, axis=-1), 0.0)
        occ, exc = occluder(p + n * RAY_EPS, wi, dist - 2 * RAY_EPS)
        excess = excess + exc
        vis = jnp.where(occ | ~found, 0.0, 1.0)
        falloff = (vis / jnp.maximum(dist2, 1e-20))[:, None] * lint
        brdf = (albedo / jnp.pi * cos[:, None]
                + phong_specular(d, n, wi, spec, shin)[:, None])
        direct = direct + brdf * falloff

    local = emission + albedo * cfg.ambient + direct
    return found, p, n, mirror, local, excess


def make_ring_render_fn(scene: Scene, cfg, mesh: jax.sharding.Mesh,
                        use_ring: bool = True, use_accel: bool | None = None,
                        with_aux: bool = False,
                        k_cap: int | None = _RING_K_CAP):
    """Jitted (scene, camera) -> (H, W, 3) with geometry sharded over 'geom';
    with_aux=True returns ((H, W, 3), {'overflow': int32}) where overflow is
    the global (psum over the whole mesh) count of cull candidates dropped
    by the accel tier's _RING_K_CAP — 0 means the sharded render was exact.

    Ray placement differs per variant:
      * ring (use_ring=True): rays are sharded over BOTH mesh axes
        (('data','geom') flattened) — every device traces a distinct ray
        block while geometry blocks rotate around the 'geom' ring past it.
        Full compute parallelism on all devices; communication = G-1
        ppermutes of the geometry block per trace.
      * reduce (use_ring=False): rays sharded over 'data' and replicated
        over 'geom'; each device intersects its rays against its resident
        shard once and winners combine with pmin/psum collectives.

    Per-shard intersection tier: use_accel=None picks the cluster accel for
    big scenes (> 8192 tris) and brute rows for tiny ones; pass True/False
    to force. With the accel tier, the rotating payload is each shard's
    ClusterAccel pytree (built once per scene, outside shard_map).
    """
    g = mesh.shape[GEOM_AXIS]
    if use_accel is None:
        use_accel = scene.num_tris > 8192
    wcfg = WhittedConfig(max_bounces=cfg.max_bounces,
                         smooth_shading=cfg.smooth_shading)
    H, W = cfg.height, cfg.width
    ray_spec = P((DATA_AXIS, GEOM_AXIS)) if use_ring else P(DATA_AXIS)

    def body(o_flat, d_flat, local, lights_pos, lights_int):
        # Per-device: (R_local, 3) rays; `local` = (1, ...)-leading geometry
        # shard (triangle rows or accel pytree) — drop the shard axis.
        local = jax.tree_util.tree_map(lambda x: x[0], local)
        sky = jnp.asarray(wcfg.sky_color, jnp.float32)
        radiance = jnp.zeros(o_flat.shape, jnp.float32)
        throughput = jnp.ones(o_flat.shape, jnp.float32)
        live = jnp.ones(o_flat.shape[:1], bool)
        o, d = o_flat, d_flat

        if use_ring:
            trace = ring_trace_accel if use_accel else ring_trace_rows
            any_fn = ring_any_hit_accel if use_accel else ring_any_hit
        else:
            trace = reduce_trace_accel if use_accel else reduce_trace_rows
            any_fn = reduce_any_hit_accel if use_accel else reduce_any_hit
        if use_accel:
            trace = partial(trace, k_cap=k_cap)
            any_fn = partial(any_fn, k_cap=k_cap)
        occluder = lambda so, sd, tmax: any_fn(so, sd, local, tmax)

        excess = jnp.int32(0)
        for bounce in range(wcfg.max_bounces):
            t, rows, exc = trace(o, d, local)
            excess = excess + exc
            found, p, n, mirror, local_rad, sh_exc = _shade_rows(
                lights_pos, lights_int, o, d, t, rows, occluder, wcfg)
            excess = excess + sh_exc
            valid = found & live
            miss = jnp.where((live & ~found)[:, None], sky, 0.0)
            surf = jnp.where(valid[:, None], local_rad * (1.0 - mirror), 0.0)
            radiance = radiance + throughput * (surf + miss)
            if bounce + 1 < wcfg.max_bounces:
                refl = d - 2.0 * jnp.sum(d * n, axis=-1, keepdims=True) * n
                o = p + n * RAY_EPS
                d = normalize(refl)
                throughput = throughput * mirror
                live = valid & (mirror[:, 0] > 0.0)
        # Global overflow: sum the per-device counts over the whole mesh
        # (every (data, geom) device did distinct cull work in both modes).
        excess = jax.lax.psum(jax.lax.psum(excess, DATA_AXIS), GEOM_AXIS)
        return radiance, excess

    shard_body = jax.shard_map(
        body, mesh=mesh,
        in_specs=(ray_spec, ray_spec, P(GEOM_AXIS), P(), P()),
        out_specs=(ray_spec, P()),
    )

    @jax.jit
    def run(scene: Scene, camera: Camera):
        rows = pad_rows_to_shards(pack_tri_rows(scene), g)
        shards = rows.reshape(g, -1, rows.shape[1])
        local = jax.vmap(build_rows_accel)(shards) if use_accel else shards
        rays = generate_rays(camera, H, W)
        o = rays.o.reshape(-1, 3)
        d = rays.d.reshape(-1, 3)
        img, excess = shard_body(o, d, local, scene.lights.position,
                                 scene.lights.intensity)
        img = img.reshape(H, W, 3)
        if with_aux:
            return img, {"overflow": excess}
        return img

    return run
