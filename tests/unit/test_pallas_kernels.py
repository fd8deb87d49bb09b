"""Pallas traversal kernels vs the jnp reference (interpret mode on CPU —
SURVEY.md §4: 'the brute-force jnp path is the fake-backend for the native
kernel, runnable via interpret mode')."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tracer.bvh.cluster import build_clusters
from tracer.bvh.cull import cull_clusters
from tracer.core.types import Ray, T_FAR
from tracer.core import intersect as ci
from tracer.kernels.traversal import (
    tile_rays, untile,
    trace_tiles_jnp, trace_tiles_pallas,
    any_hit_tiles_jnp, any_hit_tiles_pallas,
    make_accel_tracers,
)
from tracer.scene.procedural import random_tri_soup


def _setup(n_tris=400, n_rays=512, c=64, seed=0):
    scene = random_tri_soup(n_tris, seed=seed)
    accel = build_clusters(scene.verts, scene.tris, cluster_size=c)
    rng = np.random.default_rng(seed + 1)
    o = jnp.asarray(rng.normal(size=(n_rays, 3)).astype(np.float32) * 2)
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    o_t, d_t, tiling = tile_rays(o, d, 256)
    return scene, accel, o_t, d_t, tiling


def test_pallas_closest_matches_jnp():
    scene, accel, o_t, d_t, _ = _setup()
    cand, counts, _ = cull_clusters(accel, o_t, d_t, T_FAR, accel.num_clusters)
    ref = trace_tiles_jnp(o_t, d_t, accel, cand, counts)
    work_cap = int(o_t.shape[0] * accel.num_clusters)
    out = trace_tiles_pallas(o_t, d_t, accel, cand, counts, work_cap, interpret=True)
    bt, btri, bu, bv, overflow = out
    assert not bool(overflow)
    np.testing.assert_allclose(np.asarray(bt), np.asarray(ref[0]), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(btri), np.asarray(ref[1]))
    np.testing.assert_allclose(np.asarray(bu), np.asarray(ref[2]), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(bv), np.asarray(ref[3]), rtol=1e-5, atol=1e-6)


def test_pallas_anyhit_matches_jnp():
    scene, accel, o_t, d_t, _ = _setup(seed=3)
    t_max_t = jnp.full(o_t.shape[:2], 2.0, jnp.float32)
    cand, counts, _ = cull_clusters(accel, o_t, d_t, t_max_t, accel.num_clusters)
    ref = any_hit_tiles_jnp(o_t, d_t, t_max_t, accel, cand, counts)
    work_cap = int(o_t.shape[0] * accel.num_clusters)
    occ, overflow = any_hit_tiles_pallas(
        o_t, d_t, t_max_t, accel, cand, counts, work_cap, interpret=True)
    assert not bool(overflow)
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(ref))


def test_accel_tracers_pallas_vs_brute_end_to_end():
    scene, accel, *_ = _setup(n_tris=200, c=32, seed=5)
    trace_fn, occlude_fn = make_accel_tracers(
        scene, accel, use_pallas=True, interpret=True,
        work_items_per_tile=accel.num_clusters + 1)
    rng = np.random.default_rng(9)
    o = jnp.asarray(rng.normal(size=(300, 3)).astype(np.float32) * 2)
    d = rng.normal(size=(300, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    ray = Ray(o=o, d=d)
    hit = trace_fn(ray)
    ref = ci.intersect_brute(ray, scene.verts, scene.tris)
    same_tri = np.asarray(hit.tri) == np.asarray(ref.tri)
    same_t = np.isclose(np.asarray(hit.t), np.asarray(ref.t), rtol=1e-4, atol=1e-6)
    assert (same_tri | same_t).all()
    occ = occlude_fn(ray, jnp.full((300,), 3.0, jnp.float32))
    occ_ref = ci.any_hit_brute(ray, scene.verts, scene.tris, t_max=jnp.full((300,), 3.0))
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(occ_ref))
