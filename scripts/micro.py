#!/usr/bin/env python3
"""Micro-benchmarks for hot-path design decisions (sort, gather, dot vs FMA)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        r = fn(*args)
        jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters * 1e3


key = jax.random.PRNGKey(0)

# Per-tile sort of packed candidate words at various shapes.
for nt, nc in [(8100, 801), (8100, 3200), (32400, 801), (32400, 3200)]:
    x = jax.random.randint(key, (nt, nc), 0, 1 << 30, dtype=jnp.int32)
    f = jax.jit(lambda a: jnp.sort(a, axis=1))
    print(f"sort ({nt},{nc}) i32:    {timeit(f, x):8.2f} ms")

# top_k alternative
for nt, nc, k in [(8100, 3200, 256), (32400, 3200, 64)]:
    x = jax.random.randint(key, (nt, nc), 0, 1 << 30, dtype=jnp.int32)
    f = jax.jit(lambda a: jax.lax.top_k(-a, k))
    print(f"top_k ({nt},{nc})->{k}:  {timeit(f, x):8.2f} ms")

# Gather: repack candidate subcluster data (rows of 512 floats)
for rows, width, n_src in [(8100 * 24, 512, 3200), (32400 * 12, 512, 3200)]:
    src = jax.random.normal(key, (n_src, width), jnp.float32)
    idx = jax.random.randint(key, (rows,), 0, n_src, dtype=jnp.int32)
    f = jax.jit(lambda s, i: s[i])
    print(f"gather {rows}x{width} from ({n_src},{width}): {timeit(f, src, idx):8.2f} ms "
          f"({rows*width*4/1e9:.2f} GB)")

# dot vs FMA for (256,4)x(4,384) fp32 batched over items
B = 2048
o4 = jax.random.normal(key, (B, 256, 4), jnp.float32)
w = jax.random.normal(key, (B, 4, 384), jnp.float32)

def fma(o4, w):
    return (o4[..., 0:1] * w[..., 0:1, :] + o4[..., 1:2] * w[..., 1:2, :]
            + o4[..., 2:3] * w[..., 2:3, :] + o4[..., 3:4] * w[..., 3:4, :])

f1 = jax.jit(fma)
f2 = jax.jit(lambda o4, w: jnp.einsum("brk,bkc->brc", o4, w,
                                      preferred_element_type=jnp.float32))
print(f"FMA   (2048x256x4x384): {timeit(f1, o4, w):8.2f} ms")
print(f"dot   (2048x256x4x384): {timeit(f2, o4, w):8.2f} ms")

# divide vs reciprocal on (2048, 256, 128)
x = jax.random.normal(key, (B, 256, 128), jnp.float32) + 2.0
y = jax.random.normal(key, (B, 256, 128), jnp.float32)
f3 = jax.jit(lambda a, b: a / b)
f4 = jax.jit(lambda a, b: a * (1.0 / b))
print(f"div   (2048x256x128):   {timeit(f3, y, x):8.2f} ms")
print(f"recip (2048x256x128):   {timeit(f4, y, x):8.2f} ms")
