"""v3 pair-grid traversal kernels vs brute force (interpret mode on CPU).

Same correctness contract as test_traversal2 (SURVEY.md §4): the
accelerated traversal must agree with testing every triangle. Extra
coverage here: the pair-stream expansion itself and the multi-chunk
(aliased carry) path.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tracer.bvh.cluster import build_clusters
from tracer.bvh.cull import cull_clusters_sorted, WORD_INVALID
from tracer.core.camera import Camera, generate_rays
from tracer.core.intersect import intersect_brute, any_hit_brute
from tracer.core.types import Ray, T_FAR
from tracer.kernels import traversal3
from tracer.kernels.traversal3 import build_pair_stream, make_pair_tracers
from tracer.scene.procedural import bunny_scene


def _cam(c):
    return Camera.make(**c) if isinstance(c, dict) else c


@pytest.fixture(scope="module")
def bunny():
    scene, cam = bunny_scene(subdiv=3)
    return scene, _cam(cam)


def test_pair_stream_expansion():
    # 3 tiles with counts 2, 0, 3 -> sentinel pair for the empty tile.
    words = jnp.full((3, 4), WORD_INVALID, jnp.int32)
    words = words.at[0, :2].set(jnp.array([5, 9]))
    words = words.at[2, :3].set(jnp.array([1, 2, 3]))
    counts = jnp.array([2, 0, 3], jnp.int32)
    tiles, pwords, total, overflow = build_pair_stream(words, counts, 8)
    assert int(total) == 6 and not bool(overflow)
    np.testing.assert_array_equal(
        np.asarray(tiles), [0, 0, 1, 2, 2, 2, 3, 3])
    np.testing.assert_array_equal(
        np.asarray(pwords),
        [5, 9, int(WORD_INVALID), 1, 2, 3, int(WORD_INVALID), int(WORD_INVALID)])


def test_pair_stream_overflow_clamps_far():
    words = jnp.arange(12, dtype=jnp.int32).reshape(3, 4)
    counts = jnp.array([4, 4, 4], jnp.int32)
    tiles, pwords, total, overflow = build_pair_stream(words, counts, 6)
    assert bool(overflow)
    # Uniform clamp to p_cap // n_tiles = 2 nearest candidates per tile.
    np.testing.assert_array_equal(np.asarray(tiles), [0, 0, 1, 1, 2, 2])
    np.testing.assert_array_equal(np.asarray(pwords), [0, 1, 4, 5, 8, 9])


def test_closest_matches_brute(bunny):
    scene, cam = bunny
    rays = generate_rays(cam, 64, 64)
    accel = build_clusters(scene.verts, scene.tris)
    trace, _ = make_pair_tracers(scene, accel, interpret=True)
    got = trace(rays)
    want = intersect_brute(rays, scene.verts, scene.tris)
    np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(want.valid))
    m = np.asarray(want.valid)
    np.testing.assert_allclose(np.asarray(got.t)[m], np.asarray(want.t)[m],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got.tri)[m], np.asarray(want.tri)[m])


def test_anyhit_matches_brute(bunny):
    scene, cam = bunny
    rays = generate_rays(cam, 48, 48)
    accel = build_clusters(scene.verts, scene.tris)
    _, occlude = make_pair_tracers(scene, accel, interpret=True)
    t_max = jnp.full(rays.batch_shape, 10.0)
    got = occlude(rays, t_max)
    want = any_hit_brute(rays, scene.verts, scene.tris, t_max=t_max)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_multichunk_matches_singlechunk(bunny, monkeypatch):
    """Force the chunked (aliased carry) path and check it's identical."""
    scene, cam = bunny
    rays = generate_rays(cam, 64, 64)
    accel = build_clusters(scene.verts, scene.tris)
    trace1, occ1 = make_pair_tracers(scene, accel, interpret=True)
    ref_hit = trace1(rays)
    ref_occ = occ1(rays, jnp.full(rays.batch_shape, 10.0))

    monkeypatch.setattr(traversal3, "PAIR_CHUNK", 512)
    trace2, occ2 = make_pair_tracers(scene, accel, interpret=True)
    got_hit = trace2(rays)
    got_occ = occ2(rays, jnp.full(rays.batch_shape, 10.0))
    np.testing.assert_array_equal(np.asarray(got_hit.tri), np.asarray(ref_hit.tri))
    np.testing.assert_allclose(np.asarray(got_hit.t), np.asarray(ref_hit.t),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(got_occ), np.asarray(ref_occ))
