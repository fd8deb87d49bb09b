#!/usr/bin/env python3
"""Per-phase timing of the bench100k pipeline on the live chip.

Times each stage of the hot path separately (each jitted on its own):
  build   — cluster accel build
  raygen  — camera ray generation + tiling
  cull    — frustum cull + candidate list construction
  worklist— flatten/pack the work list
  closest — the Pallas closest-hit kernel
  anyhit  — the Pallas any-hit (shadow) kernel
  full    — the end-to-end jitted render for reference
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tracer.api import get_scene, make_render_fn
from tracer.utils.config import load_config
from tracer.core.camera import generate_rays
from tracer.bvh import build_scene_accel
from tracer.bvh.cull import cull_clusters
from tracer.kernels.traversal import (
    tile_rays, build_worklist, pack_worklist, trace_tiles_pallas,
    any_hit_tiles_pallas, trace_tiles_jnp, DEFAULT_TILE)
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
    scene, camera = get_scene(cfg)
    print(f"scene tris={scene.num_tris} image={cfg.height}x{cfg.width} "
          f"bounces={cfg.max_bounces} lights={scene.lights.count}", flush=True)

    build = jax.jit(build_scene_accel)
    ms = timeit(build, scene)
    accel = build(scene)
    print(f"build:    {ms:8.2f} ms   clusters={accel.num_clusters} C={accel.cluster_size}")

    @jax.jit
    def raygen(camera):
        rays = generate_rays(camera, cfg.height, cfg.width)
        return tile_rays(rays.o, rays.d, DEFAULT_TILE)[:2]
    ms = timeit(raygen, camera)
    o_t, d_t = raygen(camera)
    print(f"raygen:   {ms:8.2f} ms   tiles={o_t.shape[0]} TR={o_t.shape[1]}")

    k = accel.num_clusters
    cull = jax.jit(lambda a, o, d: cull_clusters(a, o, d, T_FAR, k))
    ms = timeit(cull, accel, o_t, d_t)
    cand, counts, _ = cull(accel, o_t, d_t)
    import numpy as np
    cnp = np.asarray(counts)
    print(f"cull:     {ms:8.2f} ms   count mean={cnp.mean():.1f} p50={np.percentile(cnp,50):.0f} "
          f"p99={np.percentile(cnp,99):.0f} max={cnp.max()} total={cnp.sum()}")

    work_cap = o_t.shape[0] * 32
    wl = jax.jit(lambda c, n: pack_worklist(*build_worklist(c, n, work_cap)[:3]))
    ms = timeit(wl, cand, counts)
    print(f"worklist: {ms:8.2f} ms   cap={work_cap}")

    closest = jax.jit(lambda o, d, a, c, n: trace_tiles_pallas(o, d, a, c, n, work_cap))
    ms = timeit(closest, o_t, d_t, accel, cand, counts)
    bt = closest(o_t, d_t, accel, cand, counts)[0]
    print(f"closest:  {ms:8.2f} ms   hit_frac={float(jnp.mean(bt < T_FAR)):.3f}")

    tmax = jnp.full(o_t.shape[:2], 100.0, jnp.float32)
    anyhit = jax.jit(lambda o, d, tm, a, c, n: any_hit_tiles_pallas(o, d, tm, a, c, n, work_cap))
    ms = timeit(anyhit, o_t, d_t, tmax, accel, cand, counts)
    print(f"anyhit:   {ms:8.2f} ms")

    run = make_render_fn(scene, cfg)
    ms = timeit(run, scene, camera)
    print(f"full:     {ms:8.2f} ms")


if __name__ == "__main__":
    main()
