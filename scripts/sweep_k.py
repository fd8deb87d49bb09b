#!/usr/bin/env python3
"""Sweep k_cap (words per tile) and MAX_WORDS_PER_CALL chunking."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tracer.api import get_scene
from tracer.utils.config import load_config
from tracer.core.camera import generate_rays
from tracer.bvh import build_scene_accel
from tracer.bvh.cull import cull_clusters_sorted
from tracer.kernels.traversal import tile_rays
from tracer.kernels import traversal2 as t2
from tracer.core.types import T_FAR


def timeit(fn, *args, iters=8, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    cfg = load_config("bench100k")
    scene, camera = get_scene(cfg)
    accel = jax.jit(build_scene_accel)(scene)
    rays = generate_rays(camera, cfg.height, cfg.width)
    o_t, d_t, _ = tile_rays(rays.o, rays.d, 64)
    tmax = jnp.full(o_t.shape[:2], 100.0, jnp.float32)
    for max_words in (128 * 1024, 512 * 1024):
        t2.MAX_WORDS_PER_CALL = max_words
        for k in (64, 128, 256):
            cull = jax.jit(lambda a, o, d, k=k: cull_clusters_sorted(
                a, o, d, T_FAR, k))
            words, counts, exc = cull(accel, o_t, d_t)
            ch, n_chunks = t2._chunk(o_t.shape[0], k, 8)
            f = jax.jit(lambda o, d, a, w, n: t2.trace_tiles_sorted(o, d, a, w, n))
            ms = timeit(f, o_t, d_t, accel, words, counts)
            f2 = jax.jit(lambda o, d, tm, a, w, n: t2.any_hit_tiles_sorted(
                o, d, tm, a, w, n))
            ms2 = timeit(f2, o_t, d_t, tmax, accel, words, counts)
            print(f"mw={max_words//1024}K k={k:4d} chunks={n_chunks:3d} "
                  f"closest={ms:7.2f} ms anyhit={ms2:7.2f} ms "
                  f"excess={int(exc)}", flush=True)


if __name__ == "__main__":
    main()
