"""LBVH build invariants + traversal vs brute force (SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tracer.bvh.lbvh import (
    build_lbvh,
    trace_rays_lbvh,
    any_hit_lbvh,
    make_lbvh_tracers,
)
from tracer.core.intersect import intersect_brute, any_hit_brute
from tracer.core.types import Ray, T_FAR
from tracer.scene import cornell_box, random_tri_soup


def _random_rays(rng, n, spread=2.0):
    o = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return Ray(o=jnp.asarray(o), d=jnp.asarray(d))


@pytest.mark.parametrize("n_tris", [1, 2, 7, 64, 257])
def test_build_invariants(n_tris):
    scene = random_tri_soup(n_tris, seed=3)
    bvh = build_lbvh(scene.verts, scene.tris)
    assert bvh.num_leaves == n_tris
    assert bvh.num_internal == max(n_tris - 1, 0)

    # Every triangle appears in exactly one leaf.
    leaf_tri = np.sort(np.asarray(bvh.leaf_tri))
    np.testing.assert_array_equal(leaf_tri, np.arange(n_tris))

    if n_tris < 2:
        return
    ni = bvh.num_internal
    left = np.asarray(bvh.left)
    right = np.asarray(bvh.right)
    # Each non-root node has exactly one parent; children are in range.
    children = np.concatenate([left, right])
    assert children.min() >= 1 or n_tris == 1
    assert children.max() <= 2 * n_tris - 2
    counts = np.bincount(children, minlength=2 * n_tris - 1)
    assert counts[0] == 0  # root unreferenced
    np.testing.assert_array_equal(counts[1:], 1)

    # Parent AABB contains both child AABBs.
    lo = np.asarray(bvh.node_lo)
    hi = np.asarray(bvh.node_hi)
    for c in (left, right):
        assert np.all(lo[np.arange(ni)] <= lo[c] + 1e-6)
        assert np.all(hi[np.arange(ni)] >= hi[c] - 1e-6)
    # All AABBs finite (the fit loop converged).
    assert np.all(np.isfinite(lo)) and np.all(np.isfinite(hi))


@pytest.mark.parametrize("n_tris", [1, 5, 60, 300])
def test_traversal_matches_brute(n_tris):
    scene = random_tri_soup(n_tris, seed=11)
    rng = np.random.default_rng(17)
    rays = _random_rays(rng, 256)

    bvh = build_lbvh(scene.verts, scene.tris)
    got = trace_rays_lbvh(rays, bvh, scene.verts, scene.tris)
    want = intersect_brute(rays, scene.verts, scene.tris)

    np.testing.assert_allclose(np.asarray(got.t), np.asarray(want.t), rtol=1e-5, atol=1e-5)
    both_hit = np.asarray(got.valid) & np.asarray(want.valid)
    # Triangle ids agree wherever the hit is unambiguous (distinct t values).
    np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(want.valid))
    np.testing.assert_allclose(
        np.asarray(got.uv)[both_hit], np.asarray(want.uv)[both_hit], rtol=1e-4, atol=1e-4
    )


def test_any_hit_matches_brute():
    scene = random_tri_soup(120, seed=5)
    rng = np.random.default_rng(23)
    rays = _random_rays(rng, 512)
    t_max = jnp.asarray(rng.uniform(0.1, 4.0, (512,)).astype(np.float32))

    bvh = build_lbvh(scene.verts, scene.tris)
    got = any_hit_lbvh(rays, t_max, bvh, scene.verts, scene.tris)
    want = any_hit_brute(rays, scene.verts, scene.tris, t_max=t_max)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_cornell_image_matches_brute():
    from tracer.render.whitted import WhittedConfig, render_image

    from tracer.core.camera import Camera

    scene, cam = cornell_box()
    cam = Camera.make(**cam)
    cfg = WhittedConfig(max_bounces=1, smooth_shading=False)
    trace_fn, occlude_fn = make_lbvh_tracers(scene)
    img_lbvh = np.asarray(render_image(scene, cam, 64, 64, cfg, trace_fn, occlude_fn))
    img_brute = np.asarray(render_image(scene, cam, 64, 64, cfg))
    # The LBVH leaf test is classic Moller-Trumbore while the brute path uses
    # the affine-map formulation; rays grazing shared triangle edges can
    # classify differently (measure-zero set). Require pixel-exact agreement
    # outside a <0.5% budget of edge pixels.
    close = np.isclose(img_lbvh, img_brute, rtol=1e-3, atol=1e-4).all(axis=-1)
    assert 1.0 - close.mean() < 0.005, f"{(~close).sum()} differing pixels"


def test_build_is_jittable():
    scene = random_tri_soup(50, seed=9)
    built = jax.jit(build_lbvh)(scene.verts, scene.tris)
    ref = build_lbvh(scene.verts, scene.tris)
    np.testing.assert_array_equal(np.asarray(built.left), np.asarray(ref.left))
    np.testing.assert_allclose(np.asarray(built.node_lo), np.asarray(ref.node_lo))
