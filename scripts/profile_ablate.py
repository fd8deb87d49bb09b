#!/usr/bin/env python3
"""In-frame phase decomposition by ablation (standalone per-phase timings
over the tunnel include dispatch overhead; differences of full frames do
not): bench100k frame with 1 light vs 0 lights isolates the shadow
pass's true in-frame cost (shadow cull + any-hit kernel)."""
import sys, os, time, dataclasses
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from tracer.api import get_scene, make_render_fn
from tracer.scene.types import Lights
from tracer.utils.config import load_config


def bench_frame(scene, cfg, camera, iters=10):
    run = make_render_fn(scene, cfg)
    checksum = jax.jit(jnp.sum)
    float(checksum(run(scene, camera)))
    float(checksum(run(scene, camera)))
    t0 = time.perf_counter()
    img = None
    for _ in range(iters):
        img = run(scene, camera)
    float(checksum(img))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    cfg = load_config("bench100k")
    scene, camera = get_scene(cfg)
    ms_full = bench_frame(scene, cfg, camera)
    print(f"full frame (1 light):   {ms_full:7.2f} ms", flush=True)
    nolight = dataclasses.replace(
        scene, lights=Lights(position=jnp.zeros((0, 3), jnp.float32),
                             intensity=jnp.zeros((0, 3), jnp.float32)))
    ms_nl = bench_frame(nolight, cfg, camera)
    print(f"no-shadow frame:        {ms_nl:7.2f} ms", flush=True)
    print(f"=> in-frame shadow pass (s-cull + any-hit): "
          f"{ms_full - ms_nl:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
