#!/usr/bin/env python3
"""Per-phase timing of the CURRENT (r4) tiled pipeline on the live chip:
two-stage cull (cull_clusters_sorted2), tiled raygen, sized caps."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from tracer.api import get_scene, make_render_fn
from tracer.utils.config import load_config
from tracer.bvh import build_scene_accel
from tracer.bvh.cull import cull_clusters_sorted2
from tracer.kernels.traversal import generate_rays_tiled
from tracer.kernels.traversal2 import (
    trace_tiles_sorted, any_hit_tiles_sorted, DEFAULT_K)
from tracer.render.tiled import K_CLOSEST, S_CAP
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
    tr = int(os.environ.get("TR", "64"))
    kc = int(os.environ.get("KC", str(K_CLOSEST)))
    ks = int(os.environ.get("KS", str(DEFAULT_K)))
    sc = int(os.environ.get("SC", str(S_CAP)))
    scene, camera = get_scene(cfg)
    print(f"scene tris={scene.num_tris} image={cfg.height}x{cfg.width} "
          f"TR={tr} kc={kc} ks={ks} sc={sc}", flush=True)

    csize = int(os.environ.get("CSIZE", "128"))
    build = jax.jit(lambda s: build_scene_accel(s, cluster_size=csize))
    ms = timeit(build, scene)
    accel = build(scene)
    ncl = accel.num_clusters
    print(f"build:    {ms:8.2f} ms   clusters={ncl} C={accel.cluster_size} "
          f"nsc={accel.super_lo.shape[0]}", flush=True)

    raygen = jax.jit(lambda c: generate_rays_tiled(c, cfg.height, cfg.width, tr)[:2])
    ms = timeit(raygen, camera)
    o_t, d_t = raygen(camera)
    print(f"raygen:   {ms:8.2f} ms   tiles={o_t.shape[0]}", flush=True)

    cull = jax.jit(lambda a, o, d: cull_clusters_sorted2(a, o, d, T_FAR, kc, sc)[:2])
    ms = timeit(cull, accel, o_t, d_t)
    words, counts = cull(accel, o_t, d_t)
    cnp = np.asarray(counts)
    print(f"cull2:    {ms:8.2f} ms   count mean={cnp.mean():.1f} "
          f"p50={np.percentile(cnp,50):.0f} p99={np.percentile(cnp,99):.0f} "
          f"max={cnp.max()}", flush=True)

    closest = jax.jit(lambda o, d, a, w, n: trace_tiles_sorted(o, d, a, w, n))
    ms = timeit(closest, o_t, d_t, accel, words, counts)
    bt, gid = closest(o_t, d_t, accel, words, counts)
    print(f"closest:  {ms:8.2f} ms   hit_frac={float(jnp.mean(bt < T_FAR)):.3f}",
          flush=True)

    from tracer.kernels.traversal2 import (
        trace_tiles_split, FAST_BATCH, FAST_GROUP)

    fb = int(os.environ.get("FB", str(FAST_BATCH)))
    fg = int(os.environ.get("FG", str(FAST_GROUP)))
    from tracer.kernels.traversal2 import SPLIT_BATCH, ANYHIT_BATCH

    gb = int(os.environ.get("GB", str(SPLIT_BATCH)))   # generic-region batch
    gg = int(os.environ.get("GG", "8"))   # generic-region group
    cnp2 = np.asarray(counts)
    p = int(-(-int((cnp2 > fb).sum() + 8) // 8) * 8)
    z = int(-(-int((cnp2 > 0).sum() + 8) // 8) * 8)
    sofl = os.environ.get("SO", "0") == "1"  # shared-origin products
    closest_sp = jax.jit(lambda o, d, a, w, n: trace_tiles_split(
        o, d, a, w, n, p, z, batch=gb, group=gg,
        fast_batch=fb, fast_group=fg, shared_o=sofl)[:3])
    ms = timeit(closest_sp, o_t, d_t, accel, words, counts)
    bt2, gid2, exc = closest_sp(o_t, d_t, accel, words, counts)
    agree = float(jnp.mean((gid2 == gid)))
    print(f"closest-split: {ms:5.2f} ms  P={p} Z={z} fb={fb} fg={fg} "
          f"gb={gb} gg={gg} excess={int(exc)} agree={agree:.4f}", flush=True)

    shade_gather = jax.jit(lambda a, g: a.shade[jnp.maximum(g, 0)])
    ms = timeit(shade_gather, accel, gid)
    print(f"gather:   {ms:8.2f} ms", flush=True)

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
    print(f"s-cull2:  {ms:8.2f} ms   count mean={c2np.mean():.1f} "
          f"max={c2np.max()}", flush=True)

    ab = int(os.environ.get("AB", str(ANYHIT_BATCH)))   # any-hit batch
    ag = int(os.environ.get("AG", "8"))   # any-hit group
    anyhit = jax.jit(lambda o, d, t, a, w, c: any_hit_tiles_sorted(
        o, d, t, a, w, c, group=ag, batch=ab, shared_o=sofl))
    ms = timeit(anyhit, so, sd, tm, accel, w2, c2)
    print(f"anyhit:   {ms:8.2f} ms   ab={ab} ag={ag}", flush=True)

    run = make_render_fn(scene, cfg)
    ms = timeit(run, scene, camera)
    print(f"full:     {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
