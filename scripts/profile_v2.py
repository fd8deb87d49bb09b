#!/usr/bin/env python3
"""Per-phase timing of the v2 (tiled/sorted) pipeline on the live chip."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tracer.api import get_scene, make_render_fn
from tracer.utils.config import load_config
from tracer.core.camera import generate_rays
from tracer.bvh import build_scene_accel
from tracer.bvh.cull import cull_clusters_sorted
from tracer.kernels.traversal import tile_rays
from tracer.kernels.traversal2 import (
    trace_tiles_sorted, any_hit_tiles_sorted, DEFAULT_K)
from tracer.core.types import T_FAR


def timeit(fn, *args, iters=5, warmup=2):
    for _ in range(warmup):
        r = fn(*args)
        jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    cfg = load_config(os.environ.get("BENCH_PRESET", "bench100k"))
    tr = int(os.environ.get("TR", "256"))
    scene, camera = get_scene(cfg)
    print(f"scene tris={scene.num_tris} image={cfg.height}x{cfg.width} "
          f"bounces={cfg.max_bounces} lights={scene.lights.count} TR={tr}", flush=True)

    build = jax.jit(build_scene_accel)
    ms = timeit(build, scene)
    accel = build(scene)
    ncl = accel.num_clusters
    print(f"build:    {ms:8.2f} ms   clusters={ncl} C={accel.cluster_size}")

    @jax.jit
    def raygen(camera):
        rays = generate_rays(camera, cfg.height, cfg.width)
        return tile_rays(rays.o, rays.d, tr)[:2]
    ms = timeit(raygen, camera)
    o_t, d_t = raygen(camera)
    print(f"raygen:   {ms:8.2f} ms   tiles={o_t.shape[0]} TR={o_t.shape[1]}")

    k = min(DEFAULT_K, ncl)
    k = max(8, -(-k // 8) * 8)
    cull = jax.jit(lambda a, o, d: cull_clusters_sorted(a, o, d, T_FAR, k))
    ms = timeit(cull, accel, o_t, d_t)
    words, counts, _ = cull(accel, o_t, d_t)
    cnp = np.asarray(counts)
    print(f"cull:     {ms:8.2f} ms   k={k} count mean={cnp.mean():.1f} "
          f"p50={np.percentile(cnp,50):.0f} p99={np.percentile(cnp,99):.0f} max={cnp.max()}")

    closest = jax.jit(lambda o, d, a, w, n: trace_tiles_sorted(o, d, a, w, n))
    ms = timeit(closest, o_t, d_t, accel, words, counts)
    bt, gid = closest(o_t, d_t, accel, words, counts)
    print(f"closest:  {ms:8.2f} ms   hit_frac={float(jnp.mean(bt < T_FAR)):.3f}")

    @jax.jit
    def shade_gather(a, gid):
        return a.shade[jnp.maximum(gid, 0)]
    ms = timeit(shade_gather, accel, gid)
    print(f"gather:   {ms:8.2f} ms")

    # Shadow pass: segment from the light
    rows = shade_gather(accel, gid)
    @jax.jit
    def shadow(a, o, d, bt, rows):
        t = jnp.minimum(bt, 100.0)
        p = o + t[..., None] * d
        lpos = scene.lights.position[0]
        so = jnp.broadcast_to(lpos, p.shape)
        sd = p - lpos
        tm = jnp.full(o.shape[:2], 1.0 - 1e-3, jnp.float32)
        w2, c2, _ = cull_clusters_sorted(a, so, sd, tm, k)
        return any_hit_tiles_sorted(so, sd, tm, a, w2, c2), c2
    ms = timeit(shadow, accel, o_t, d_t, bt, rows)
    _, c2 = shadow(accel, o_t, d_t, bt, rows)
    c2np = np.asarray(c2)
    print(f"shadow:   {ms:8.2f} ms   (cull+anyhit) count mean={c2np.mean():.1f} max={c2np.max()}")

    run = make_render_fn(scene, cfg)
    ms = timeit(run, scene, camera)
    print(f"full:     {ms:8.2f} ms")


if __name__ == "__main__":
    main()
