#!/usr/bin/env python3
"""Sweep the tile-group size G of the v2 kernels on the live chip."""
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
from tracer.kernels.traversal2 import (
    trace_tiles_sorted, any_hit_tiles_sorted, DEFAULT_K)
from tracer.core.types import T_FAR


def timeit(fn, *args, iters=5, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    cfg = load_config(os.environ.get("BENCH_PRESET", "bench100k"))
    tr = int(os.environ.get("TR", "64"))
    groups = [int(g) for g in os.environ.get("GROUPS", "8").split(",")]
    batches = [int(b) for b in os.environ.get("BATCHES", "1,2,4,8").split(",")]
    scene, camera = get_scene(cfg)
    accel = jax.jit(build_scene_accel)(scene)
    rays = generate_rays(camera, cfg.height, cfg.width)
    o_t, d_t, _ = tile_rays(rays.o, rays.d, tr)
    k = max(8, -(-min(DEFAULT_K, accel.num_clusters) // 8) * 8)
    words, counts, _ = jax.jit(
        lambda a, o, d: cull_clusters_sorted(a, o, d, T_FAR, k))(accel, o_t, d_t)
    print(f"tiles={o_t.shape[0]} TR={tr} k={k}", flush=True)

    ref_bt = None
    for g in groups:
      for b in batches:
        f = jax.jit(lambda o, d, a, w, n, g=g, b=b: trace_tiles_sorted(
            o, d, a, w, n, group=g, batch=b))
        ms = timeit(f, o_t, d_t, accel, words, counts)
        bt, gid = f(o_t, d_t, accel, words, counts)
        if ref_bt is None:
            ref_bt = np.asarray(bt)
        ok = np.array_equal(np.asarray(bt), ref_bt)
        print(f"closest G={g:3d} B={b:2d}: {ms:8.2f} ms  match={ok}", flush=True)

    tmax = jnp.full(o_t.shape[:2], 100.0, jnp.float32)
    w2, c2, _ = jax.jit(
        lambda a, o, d, tm: cull_clusters_sorted(a, o, d, tm, k))(
        accel, o_t, d_t, tmax)
    ref_occ = None
    for g in groups:
      for b in batches:
        f = jax.jit(lambda o, d, tm, a, w, n, g=g, b=b: any_hit_tiles_sorted(
            o, d, tm, a, w, n, group=g, batch=b))
        ms = timeit(f, o_t, d_t, tmax, accel, w2, c2)
        occ = np.asarray(f(o_t, d_t, tmax, accel, w2, c2))
        if ref_occ is None:
            ref_occ = occ
        ok = np.array_equal(occ, ref_occ)
        print(f"anyhit  G={g:3d} B={b:2d}: {ms:8.2f} ms  match={ok}", flush=True)


if __name__ == "__main__":
    main()
