#!/usr/bin/env python3
"""Micro-benchmark the sorted-cull internals on the live chip: interval
test, pack, full-sort-then-slice vs top_k."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tracer.api import get_scene
from tracer.utils.config import load_config
from tracer.core.camera import generate_rays
from tracer.bvh import build_scene_accel
from tracer.bvh.cull import (tile_bounds, frustum_aabb_entry, pack_candidates,
                             cull_clusters_sorted, WORD_INVALID)
from tracer.kernels.traversal import tile_rays
from tracer.core.types import T_FAR


def timeit(fn, *args, iters=10, warmup=2):
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
    n_cl = accel.num_clusters
    print(f"tiles={o_t.shape[0]} ncl={n_cl}", flush=True)

    @jax.jit
    def interval_only(a, o, d):
        o_lo, o_hi, d_lo, d_hi = tile_bounds(o, d)
        ok, t_lo = frustum_aabb_entry(
            o_lo[:, None], o_hi[:, None], d_lo[:, None], d_hi[:, None],
            a.cluster_lo[None], a.cluster_hi[None], jnp.float32(T_FAR))
        return ok, t_lo
    ms = timeit(interval_only, accel, o_t, d_t)
    print(f"interval: {ms:8.2f} ms", flush=True)

    @jax.jit
    def pack_only(a, o, d):
        ok, t_lo = interval_only(a, o, d)
        ids = jnp.arange(n_cl, dtype=jnp.int32)[None, :]
        return pack_candidates(t_lo, ids, ok)
    ms = timeit(pack_only, accel, o_t, d_t)
    print(f"+pack:    {ms:8.2f} ms", flush=True)

    for k in (64, 256):
        f = jax.jit(lambda a, o, d, k=k: cull_clusters_sorted(a, o, d, T_FAR, k))
        ms = timeit(f, a := accel, o_t, d_t)
        print(f"sort k={k}: {ms:8.2f} ms", flush=True)

    for k in (64, 256):
        @jax.jit
        def topk(a, o, d, k=k):
            w = pack_only(a, o, d)
            nw, _ = jax.lax.top_k(-w, k)
            counts = jnp.sum(w != WORD_INVALID, axis=1).astype(jnp.int32)
            return -nw, jnp.minimum(counts, k)
        ms = timeit(topk, accel, o_t, d_t)
        w_ref, c_ref, _ = jax.jit(
            lambda a, o, d, k=k: cull_clusters_sorted(a, o, d, T_FAR, k))(
            accel, o_t, d_t)
        w_tk, c_tk = topk(accel, o_t, d_t)
        ok = np.array_equal(np.asarray(w_tk), np.asarray(w_ref))
        print(f"topk k={k}: {ms:8.2f} ms  match={ok}", flush=True)


if __name__ == "__main__":
    main()
