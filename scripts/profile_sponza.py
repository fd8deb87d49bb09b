#!/usr/bin/env python3
"""Phase profile of the sponza1080 frame at its SIZED caps: which of
cull / closest / any-hit dominates the 739 ms (r5) frame."""
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
from tracer.kernels.traversal import generate_rays_tiled
from tracer.kernels.traversal2 import trace_tiles_split, any_hit_tiles_graded
from tracer.core.types import T_FAR


def timeit(fn, *args, iters=3, warmup=1):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    cfg = load_config("sponza1080")
    kc, ks, sc = 1930, 1400, 121
    u_c, u_s = (80, 256), (48, 256)
    scene, camera = get_scene(cfg)
    accel = jax.jit(build_scene_accel)(scene)
    print(f"tris={scene.num_tris} clusters={accel.num_clusters} "
          f"nsc={accel.super_lo.shape[0]}", flush=True)
    o_t, d_t, _ = jax.jit(
        lambda c: generate_rays_tiled(c, cfg.height, cfg.width, 64))(camera)

    cull = jax.jit(lambda a, o, d: cull_clusters_sorted2(a, o, d, T_FAR, kc, sc)[:2])
    ms = timeit(cull, accel, o_t, d_t)
    words, counts = cull(accel, o_t, d_t)
    cnp = np.asarray(counts)
    print(f"cull2(s={sc}, k={kc}): {ms:8.2f} ms  count mean={cnp.mean():.1f} "
          f"p50={np.percentile(cnp,50):.0f} p99={np.percentile(cnp,99):.0f} "
          f"max={cnp.max()}", flush=True)

    closest = jax.jit(lambda o, d, a, w, n: trace_tiles_split(
        o, d, a, w, n, 32400, 32400, ultra_split=u_c[0], k_mid=u_c[1])[:2])
    ms = timeit(closest, o_t, d_t, accel, words, counts)
    bt, gid = closest(o_t, d_t, accel, words, counts)
    print(f"closest-ultra: {ms:8.2f} ms", flush=True)

    @jax.jit
    def shadow_cull(a, o, d, bt):
        t = jnp.minimum(bt, 100.0)
        p = o + t[..., None] * d
        lpos = scene.lights.position[0]
        so = jnp.broadcast_to(lpos, p.shape)
        sd = p - lpos
        tm = jnp.full(o.shape[:2], 1.0 - 1e-3, jnp.float32)
        w2, c2, _, _ = cull_clusters_sorted2(a, so, sd, tm, ks, sc)
        return so, sd, tm, w2, c2
    ms = timeit(shadow_cull, accel, o_t, d_t, bt)
    so, sd, tm, w2, c2 = shadow_cull(accel, o_t, d_t, bt)
    c2np = np.asarray(c2)
    print(f"s-cull2(s={sc}, k={ks}): {ms:8.2f} ms  count mean={c2np.mean():.1f} "
          f"max={c2np.max()}", flush=True)

    anyhit = jax.jit(lambda o, d, t, a, w, c: any_hit_tiles_graded(
        o, d, t, a, w, c, 19632, 19632, ultra_split=u_s[0], k_mid=u_s[1])[0])
    ms = timeit(anyhit, so, sd, tm, accel, w2, c2)
    print(f"anyhit-ultra: {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
