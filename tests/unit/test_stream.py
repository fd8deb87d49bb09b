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


def test_streamed_render_fn_sizes_and_is_exact(monkeypatch, tmp_path):
    """make_render_fn's streamed tier (>VMEM scenes on TPU; forced
    interpret here): the sizing loop escalates (k_trace, k_occ, s) until
    overflow == 0, the image matches the jnp accel tier, and the sized
    caps persist to the cache for a fresh session."""
    import os

    import jax
    import tracer.api as api
    from tracer.core.camera import generate_rays
    from tracer.render.whitted import WhittedConfig, render_wavefront
    from tracer.utils.config import load_config

    monkeypatch.setattr(api, "_FORCE_STREAMED_INTERPRET", True)
    monkeypatch.setattr(api, "_VMEM_RESIDENT_CLUSTERS", 2)  # force tier
    monkeypatch.setenv("TRACER_CAPS_CACHE", str(tmp_path / "caps.json"))
    cfg = load_config("bunny-grad", height=32, width=32, scene_arg=3,
                      use_pallas=True)
    scene, camera = api.get_scene(cfg)
    assert -(-scene.num_tris // 128) > 2
    run = api.make_render_fn(scene, cfg)
    img, aux = run(scene, camera, with_aux=True)
    assert int(aux["overflow"]) == 0
    kc, ko, sc = run.state["caps"]
    assert kc >= 8 and ko >= 8 and sc >= 2

    wcfg = WhittedConfig(max_bounces=cfg.max_bounces,
                         smooth_shading=cfg.smooth_shading)
    ref = render_wavefront(
        scene, generate_rays(camera, 32, 32), wcfg,
        *api.build_tracers(scene, load_config(
            "bunny-grad", height=32, width=32, scene_arg=3)))
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)

    # Second session seeds from the cache: identical caps, still exact.
    run2 = api.make_render_fn(scene, cfg)
    img2, aux2 = run2(scene, camera, with_aux=True)
    assert int(aux2["overflow"]) == 0
    assert run2.state["caps"] == run.state["caps"]
