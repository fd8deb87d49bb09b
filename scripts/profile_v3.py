#!/usr/bin/env python3
"""v2 (while_loop) vs v3 (pair grid) traversal timing on the live chip."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tracer.api import get_scene
from tracer.utils.config import load_config
from tracer.core.camera import generate_rays
from tracer.core.types import T_FAR
from tracer.bvh import build_scene_accel
from tracer.bvh.cull import cull_clusters_sorted
from tracer.kernels.traversal import tile_rays
from tracer.kernels import traversal2 as t2
from tracer.kernels import traversal3 as t3


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        r = fn(*args)
        jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    cfg = load_config(os.environ.get("BENCH_PRESET", "bench100k"))
    tr = int(os.environ.get("TR", "64"))
    ppt = int(os.environ.get("PPT", "12"))
    scene, camera = get_scene(cfg)
    accel = jax.jit(build_scene_accel)(scene)
    rays = generate_rays(camera, cfg.height, cfg.width)
    o_t, d_t, _ = tile_rays(rays.o, rays.d, tr)
    n_tiles = o_t.shape[0]
    k = max(8, -(-min(256, accel.num_clusters) // 8) * 8)
    print(f"tiles={n_tiles} TR={tr} clusters={accel.num_clusters} ppt={ppt}")

    cull = jax.jit(lambda o, d: cull_clusters_sorted(accel, o, d, T_FAR, k))
    ms = timeit(cull, o_t, d_t)
    words, counts, _ = cull(o_t, d_t)
    cnp = np.asarray(counts)
    print(f"cull:       {ms:8.2f} ms  count mean={cnp.mean():.1f} "
          f"p99={np.percentile(cnp, 99):.0f} max={cnp.max()} sum={cnp.sum()}")

    v2 = jax.jit(lambda o, d, w, c: t2.trace_tiles_sorted(o, d, accel, w, c))
    ms2 = timeit(v2, o_t, d_t, words, counts)
    bt2, gid2 = v2(o_t, d_t, words, counts)
    print(f"v2 closest: {ms2:8.2f} ms  hit={float(jnp.mean(bt2 < T_FAR)):.3f}")

    v3 = jax.jit(lambda o, d, w, c: t3.trace_tiles_pairs(
        o, d, accel, w, c, pairs_per_tile=ppt))
    ms3 = timeit(v3, o_t, d_t, words, counts)
    bt3, gid3 = v3(o_t, d_t, words, counts)
    print(f"v3 closest: {ms3:8.2f} ms  hit={float(jnp.mean(bt3 < T_FAR)):.3f} "
          f"speedup={ms2 / ms3:.2f}x")
    same = float(jnp.mean((gid2 == gid3).astype(jnp.float32)))
    print(f"gid agreement: {same:.6f}")

    # Shadow: light-origin segments to the primary hit points.
    t = jnp.minimum(bt2, 100.0)
    p = o_t + t[..., None] * d_t
    lpos = scene.lights.position[0]
    so = jnp.broadcast_to(lpos, p.shape)
    sd = p - lpos
    tm = jnp.full(o_t.shape[:2], 1.0 - 1e-3, jnp.float32)
    scull = jax.jit(lambda o, d, t_: cull_clusters_sorted(accel, o, d, t_, k))
    ms = timeit(scull, so, sd, tm)
    w2, c2, _ = scull(so, sd, tm)
    print(f"shadowcull: {ms:8.2f} ms  count mean={np.asarray(c2).mean():.1f}")

    s2 = jax.jit(lambda o, d, t_, w, c: t2.any_hit_tiles_sorted(
        o, d, t_, accel, w, c))
    ms2 = timeit(s2, so, sd, tm, w2, c2)
    occ2 = s2(so, sd, tm, w2, c2)
    print(f"v2 anyhit:  {ms2:8.2f} ms  occ={float(jnp.mean(occ2)):.3f}")

    s3 = jax.jit(lambda o, d, t_, w, c: t3.any_hit_tiles_pairs(
        o, d, t_, accel, w, c, pairs_per_tile=ppt))
    ms3 = timeit(s3, so, sd, tm, w2, c2)
    occ3 = s3(so, sd, tm, w2, c2)
    agree = float(jnp.mean((occ2 == occ3).astype(jnp.float32)))
    print(f"v3 anyhit:  {ms3:8.2f} ms  occ={float(jnp.mean(occ3)):.3f} "
          f"speedup={ms2 / ms3:.2f}x agree={agree:.6f}")


if __name__ == "__main__":
    main()
