#!/usr/bin/env python3
"""Measure the HBM-streamed traversal tier (kernels.stream) on the
247k-tri sponza-class scene at 1080p/1 bounce — the r4 v1 work-list
fallback measured 4.6M rays/s here (PERF_NOTES tier table).
FORCE_SCALE=1 measures the pod-1m-sized hall (3.9M tris, 30.8k clusters)
instead. The cull excess is printed — a throughput number on truncated
geometry is not a result, so bump KC/SC until excess is 0.

NOTE: the accel must be a jit ARGUMENT, not a closure capture — closed-
over device arrays become jaxpr constants and the 189 MB pod-1m scene
matrix then rides in the remote-compile request body (HTTP 413 over the
axon tunnel)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from tracer.api import get_scene
from tracer.utils.config import load_config
from tracer.bvh import build_scene_accel
from tracer.bvh.cull import cull_clusters_sorted2
from tracer.kernels.stream import make_streamed_tracers
from tracer.kernels.traversal import tile_rays
from tracer.render.whitted import WhittedConfig, render_wavefront
from tracer.core.camera import generate_rays
from tracer.core.types import T_FAR


def main():
    scale = int(os.environ.get("FORCE_SCALE", "0"))
    cfg = load_config("sponza1080", max_bounces=1, scene_arg=scale)
    kc = int(os.environ.get("KC", "512"))
    ko = int(os.environ.get("KO", os.environ.get("KC", "512")))
    sc = int(os.environ.get("SC", "128"))
    scene, camera = get_scene(cfg)
    accel = jax.jit(build_scene_accel)(scene)
    print(f"tris={scene.num_tris} clusters={accel.num_clusters} "
          f"kc={kc} ko={ko} sc={sc}", flush=True)
    wcfg = WhittedConfig(max_bounces=1, smooth_shading=cfg.smooth_shading)

    @jax.jit
    def excess_probe(scene, accel, camera):
        rays = generate_rays(camera, cfg.height, cfg.width)
        o_t, d_t, _ = tile_rays(rays.o, rays.d, 64)
        _, _, exc, need = cull_clusters_sorted2(accel, o_t, d_t, T_FAR,
                                                kc, sc)
        return exc, need[0], need[1]

    exc, nk, ns = excess_probe(scene, accel, camera)
    print(f"primary cull excess={int(exc)} need_k={int(nk)} "
          f"need_s={int(ns)}", flush=True)

    @jax.jit
    def shadow_probe(scene, accel, camera):
        trace_fn, _ = make_streamed_tracers(scene, accel, k_cap=kc,
                                            s_cap=sc)
        rays = generate_rays(camera, cfg.height, cfg.width)
        hit = trace_fn(rays)
        t = jnp.where(hit.t < T_FAR, hit.t, 0.0)
        p = rays.o + t[..., None] * rays.d
        lpos = scene.lights.position[0]
        so = jnp.broadcast_to(lpos, p.shape)
        sd = p - lpos
        o_t, d_t, _ = tile_rays(so, sd, 64)
        tm = jnp.full(o_t.shape[:2], 1.0 - 1e-3, jnp.float32)
        _, _, exc, need = cull_clusters_sorted2(accel, o_t, d_t, tm, ko, sc)
        return exc, need[0], need[1]

    exc2, nk2, ns2 = shadow_probe(scene, accel, camera)
    print(f"shadow cull excess={int(exc2)} need_k={int(nk2)} "
          f"need_s={int(ns2)}", flush=True)

    @jax.jit
    def run(scene, accel, camera):
        trace_fn, occlude_fn = make_streamed_tracers(scene, accel,
                                                     k_cap=kc, s_cap=sc,
                                                     k_occ=ko)
        rays = generate_rays(camera, cfg.height, cfg.width)
        return render_wavefront(scene, rays, wcfg, trace_fn, occlude_fn)

    checksum = jax.jit(jnp.sum)
    t0 = time.perf_counter()
    float(checksum(run(scene, accel, camera)))
    print(f"first frame (incl. compile): {time.perf_counter()-t0:.1f}s",
          flush=True)
    iters = 5
    t0 = time.perf_counter()
    img = None
    for _ in range(iters):
        img = run(scene, accel, camera)
    float(checksum(img))
    dt = (time.perf_counter() - t0) / iters
    rays = cfg.height * cfg.width * 1 * (1 + scene.lights.count)
    print(f"streamed tier: {dt*1e3:.1f} ms/frame = {rays/dt/1e6:.1f} "
          f"Mrays/s (wavefront)", flush=True)
    im = np.asarray(run(scene, accel, camera))
    print(f"image finite={np.isfinite(im).all()} max={im.max():.3f} "
          f"mean={im.mean():.5f}", flush=True)


if __name__ == "__main__":
    main()
