#!/usr/bin/env python3
"""Microbenchmark the v2 closest-hit kernel: loop overhead vs body compute.

Synthetic counts: force every tile to scan exactly K candidates (no early
out) by setting words to near-zero entry-t and counts=K, with boxes either
huge (body always runs) or empty (body always pruned).
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tracer.api import get_scene
from tracer.utils.config import load_config
from tracer.core.camera import generate_rays
from tracer.bvh import build_scene_accel
from tracer.kernels.traversal import tile_rays
from tracer.kernels.traversal2 import trace_tiles_sorted


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
    cfg = load_config("bench100k")
    tr = int(os.environ.get("TR", "256"))
    scene, camera = get_scene(cfg)
    accel = jax.jit(build_scene_accel)(scene)
    rays = generate_rays(camera, cfg.height, cfg.width)
    o_t, d_t, _ = tile_rays(rays.o, rays.d, tr)
    n_tiles = o_t.shape[0]
    ncl = accel.num_clusters
    print(f"tiles={n_tiles} TR={tr} clusters={ncl} C={accel.cluster_size}")

    # Synthetic candidate stream: cluster ids 0..K-1, entry-t bits ~0
    # (always passes the early-out), counts = K everywhere.
    def synth(K):
        ids = jnp.arange(K, dtype=jnp.int32) % ncl
        words = jnp.broadcast_to(ids[None, :], (n_tiles, K))
        counts = jnp.full((n_tiles,), K, jnp.int32)
        return words, counts

    run = jax.jit(lambda o, d, w, c: trace_tiles_sorted(o, d, accel, w, c))
    for K in (8, 32, 64):
        w, c = synth(K)
        ms = timeit(run, o_t, d_t, w, c)
        print(f"K={K:3d} body-on : {ms:8.2f} ms  "
              f"{ms / n_tiles / K * 1e3:7.3f} us/cand")

    # Body pruned: move all rays so they can't enter any box (origins far
    # away pointing away) -> slab prune fails -> pl.when skips the body.
    o_far = o_t + 1e6
    d_away = jnp.ones_like(d_t)
    for K in (8, 32, 64):
        w, c = synth(K)
        ms = timeit(run, o_far, d_away, w, c)
        print(f"K={K:3d} body-off: {ms:8.2f} ms  "
              f"{ms / n_tiles / K * 1e3:7.3f} us/cand")

    # VPU calibration: the same dense body math as one fused jnp op over a
    # big batch (no loop, no slicing) -> practical peak for this math.
    B = 512
    o4 = jnp.concatenate([o_t[:B], jnp.ones((B, tr, 1))], -1)
    d4 = jnp.concatenate([d_t[:B], jnp.zeros((B, tr, 1))], -1)
    wmat = jnp.broadcast_to(accel.tri_w[:1], (B,) + accel.tri_w.shape[1:])

    @jax.jit
    def dense(o4, d4, w):
        c = accel.cluster_size
        so = jnp.einsum("btk,bkc->btc", o4, w)
        sd = jnp.einsum("btk,bkc->btc", d4, w)
        den = sd[..., 0:c]
        t = -so[..., 0:c] / jnp.where(den == 0.0, 1.0, den)
        u = so[..., c:2*c] + t * sd[..., c:2*c]
        v = so[..., 2*c:3*c] + t * sd[..., 2*c:3*c]
        ok = (jnp.minimum(jnp.minimum(u, v), 1.0 - u - v) >= 0.0) & (t > 0.0)
        return jnp.min(jnp.where(ok, t, 1e30), axis=-1)

    ms = timeit(dense, o4, d4, wmat)
    flops = B * tr * (2 * 4 * 2 * 3 * accel.cluster_size + 10 * accel.cluster_size)
    print(f"dense XLA body x{B}: {ms:8.2f} ms  {ms / B * 1e3:7.3f} us/cand  "
          f"~{flops / (ms / 1e3) / 1e12:.2f} TFLOP/s")


if __name__ == "__main__":
    main()
