"""Streamed (HBM-resident geometry) kernels vs brute force — the same
differential contract as test_traversal2, exercising the async-copy ring
buffer in interpret mode (SURVEY.md §4: interpret-mode differential tests
are the race-detection story for Pallas kernels)."""
import jax.numpy as jnp
import numpy as np
import pytest

from tracer.bvh.cluster import build_clusters
from tracer.core.camera import generate_rays
from tracer.core.intersect import intersect_brute, any_hit_brute
from tracer.kernels.stream import make_streamed_tracers
from tracer.scene.procedural import bunny_scene


@pytest.fixture(scope="module")
def bunny():
    scene, cam = bunny_scene(subdiv=3)
    from tracer.core.camera import Camera

    return scene, Camera.make(**cam) if isinstance(cam, dict) else cam


def test_streamed_closest_matches_brute(bunny):
    scene, cam = bunny
    rays = generate_rays(cam, 64, 64)
    # Small clusters force many candidates per tile -> real ring-buffer
    # wraparound and early-out drain coverage.
    accel = build_clusters(scene.verts, scene.tris, cluster_size=32)
    trace, _ = make_streamed_tracers(scene, accel, interpret=True)
    got = trace(rays)
    want = intersect_brute(rays, scene.verts, scene.tris)
    np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(want.valid))
    m = np.asarray(want.valid)
    np.testing.assert_allclose(np.asarray(got.t)[m], np.asarray(want.t)[m],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got.tri)[m],
                                  np.asarray(want.tri)[m])


def test_streamed_anyhit_matches_brute(bunny):
    scene, cam = bunny
    rays = generate_rays(cam, 48, 48)
    accel = build_clusters(scene.verts, scene.tris, cluster_size=32)
    _, occlude = make_streamed_tracers(scene, accel, interpret=True)
    t_max = jnp.full(rays.batch_shape, 10.0)
    got = occlude(rays, t_max)
    want = any_hit_brute(rays, scene.verts, scene.tris, t_max=t_max)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
