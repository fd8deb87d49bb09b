#!/usr/bin/env python3
"""Config-3 flagship demo at spec scale: recover a vertex perturbation of
the 82k-tri bunny from a 512x512 target image by gradient descent through
the TILED Pallas tier (diff/fit.py routes there automatically on TPU).
Reports the loss curve and wall time — 150 vertex steps plus 80 albedo
steps run in under two minutes at ~40 ms/step (most of the wall time is
the one-time sizing + compile)."""
import sys, os, time, dataclasses
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax.numpy as jnp
import numpy as np

from tracer.api import get_scene, make_render_fn
from tracer.diff.fit import FitConfig, fit
from tracer.utils.config import load_config


def main():
    cfg = load_config("bunny512")
    scene, camera = get_scene(cfg)
    target = jnp.asarray(make_render_fn(scene, cfg)(scene, camera))

    rng = np.random.default_rng(0)
    offset = jnp.asarray(
        rng.normal(0, 0.004, size=scene.verts.shape).astype(np.float32))
    start = dataclasses.replace(scene, verts=scene.verts + offset)
    rms0 = float(jnp.sqrt(jnp.mean(offset ** 2)))

    # Adam's step size is ~lr per parameter regardless of gradient
    # magnitude, so lr must sit well under the perturbation scale (2e-3
    # against a 0.004 offset random-walks the occluded/back-facing verts).
    fcfg = FitConfig(steps=150, learning_rate=2e-4)
    t0 = time.perf_counter()
    params, losses = fit(start, camera, target, cfg, fcfg)
    dt = time.perf_counter() - t0
    resid = start.verts + params["vert_offset"] - scene.verts
    rms1 = float(jnp.sqrt(jnp.mean(resid ** 2)))
    print(f"[verts] steps=150 wall={dt:.1f}s ({dt/150*1e3:.1f} ms/step "
          f"incl. sizing+compile)", flush=True)
    print(f"[verts] loss: {losses[0]:.3e} -> {losses[-1]:.3e} "
          f"({losses[0]/max(losses[-1],1e-30):.1f}x)", flush=True)
    print(f"[verts] vertex RMS error: {rms0:.5f} -> {rms1:.5f}", flush=True)

    # Albedo recovery: well-conditioned for interior gradients.
    mats = scene.materials
    bad = dataclasses.replace(
        scene, materials=dataclasses.replace(
            mats, albedo=jnp.clip(jnp.asarray(mats.albedo) + 0.15, 0, 1)))
    fcfg2 = FitConfig(steps=80, learning_rate=5e-3, optimize_verts=False,
                      optimize_albedo=True)
    t0 = time.perf_counter()
    params2, losses2 = fit(bad, camera, target, cfg, fcfg2)
    dt2 = time.perf_counter() - t0
    err0 = float(jnp.abs(jnp.asarray(bad.materials.albedo)
                         - jnp.asarray(mats.albedo)).max())
    err1 = float(jnp.abs(params2["albedo"]
                         - jnp.asarray(mats.albedo)).max())
    print(f"[albedo] steps=80 wall={dt2:.1f}s; loss {losses2[0]:.3e} -> "
          f"{losses2[-1]:.3e} ({losses2[0]/max(losses2[-1],1e-30):.0f}x); "
          f"max albedo err {err0:.3f} -> {err1:.3f}", flush=True)


if __name__ == "__main__":
    main()
