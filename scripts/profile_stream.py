#!/usr/bin/env python3
"""Measure the HBM-streamed traversal tier (kernels.stream) on the
247k-tri sponza-class scene at 1080p/1 bounce — the r4 v1 work-list
fallback measured 4.6M rays/s here (PERF_NOTES tier table); the streamed
v2 walk should remove most of that cliff. FORCE_SCALE=1 measures the
pod-1m-sized hall (656k tris, 30.8k clusters) instead."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from tracer.api import get_scene
from tracer.utils.config import load_config
from tracer.bvh import build_scene_accel
from tracer.kernels.stream import make_streamed_tracers
from tracer.render.whitted import WhittedConfig, render_wavefront
from tracer.core.camera import generate_rays


def main():
    scale = int(os.environ.get("FORCE_SCALE", "0"))
    cfg = load_config("sponza1080", max_bounces=1, scene_arg=scale)
    kc = int(os.environ.get("KC", "256"))
    sc = int(os.environ.get("SC", "64"))
    scene, camera = get_scene(cfg)
    accel = jax.jit(build_scene_accel)(scene)
    print(f"tris={scene.num_tris} clusters={accel.num_clusters} "
          f"kc={kc} sc={sc}", flush=True)
    wcfg = WhittedConfig(max_bounces=1, smooth_shading=cfg.smooth_shading)
    trace_fn, occlude_fn = make_streamed_tracers(scene, accel, k_cap=kc,
                                                 s_cap=sc)

    @jax.jit
    def run(scene, camera):
        rays = generate_rays(camera, cfg.height, cfg.width)
        return render_wavefront(scene, rays, wcfg, trace_fn, occlude_fn)

    checksum = jax.jit(jnp.sum)
    t0 = time.perf_counter()
    float(checksum(run(scene, camera)))
    print(f"first frame (incl. compile): {time.perf_counter()-t0:.1f}s",
          flush=True)
    iters = 5
    t0 = time.perf_counter()
    img = None
    for _ in range(iters):
        img = run(scene, camera)
    float(checksum(img))
    dt = (time.perf_counter() - t0) / iters
    rays = cfg.height * cfg.width * 1 * (1 + scene.lights.count)
    print(f"streamed tier: {dt*1e3:.1f} ms/frame = {rays/dt/1e6:.1f} "
          f"Mrays/s (wavefront)", flush=True)
    im = np.asarray(run(scene, camera))
    print(f"image finite={np.isfinite(im).all()} max={im.max():.3f}",
          flush=True)


if __name__ == "__main__":
    main()
