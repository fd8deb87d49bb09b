#!/usr/bin/env python3
"""Cost of the edge-aware (silhouette-gradient) tier at increasing scale:
one fit step (loss+grad+update) through diff.edge_accel on the bunny at
128/256 px — the honest number missing from r4 (edge-aware had only a
64-px 10-tri convergence test)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import optax

from tracer.api import get_scene
from tracer.diff.fit import FitConfig, make_loss_fn, init_params
from tracer.utils.config import load_config


def one(res, subdiv):
    cfg = load_config("bunny-grad", height=res, width=res,
                      scene_arg=subdiv)
    scene, camera = get_scene(cfg)
    target = jnp.zeros((res, res, 3), jnp.float32)
    fcfg = FitConfig(edge_aware=True)
    loss_fn = make_loss_fn(scene, camera, target, cfg, fcfg)
    opt = optax.adam(1e-2)
    params = init_params(scene, fcfg)
    st = opt.init(params)

    @jax.jit
    def step(params, st):
        # make_loss_fn returns (loss, overflow) — differentiate with
        # has_aux like fit()'s step_fn.
        (loss, _ovf), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        up, st = opt.update(g, st, params)
        return loss, optax.apply_updates(params, up), st

    t0 = time.perf_counter()
    loss, params, st = step(params, st)
    jax.block_until_ready(loss)
    print(f"res={res} subdiv={subdiv} tris={scene.num_tris} "
          f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        loss, params, st = step(params, st)
    jax.block_until_ready(loss)
    print(f"  edge-aware step: {(time.perf_counter()-t0)/iters*1e3:.1f} ms",
          flush=True)


def main():
    one(128, 3)
    one(256, 4)


if __name__ == "__main__":
    main()
