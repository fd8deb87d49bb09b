#!/usr/bin/env python3
"""On-chip parity check of the tiled Pallas grad tier vs the jnp tier:
the same contract tests/grad/test_tiled_grad.py proves in interpret mode,
run against the real Mosaic kernels (guards the bench's
grad_step_bunny512_ms claim)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tracer.api import get_scene, make_grad_step_fn
from tracer.utils.config import load_config


def grads_via_sgd(step, scene, camera, target, params):
    opt = optax.sgd(1.0)
    loss, new_params, _, aux = step(scene, camera, target, params,
                                    opt.init(params))
    assert int(aux["overflow"]) == 0
    return loss, jax.tree.map(lambda a, b: a - b, params, new_params)


def main():
    cfg = load_config("bunny-grad", height=64, width=64, use_pallas=True)
    scene, camera = get_scene(cfg)
    # A REAL rendered target, not zeros: the r5 untile-fusion
    # miscompilation mis-indexed a closed-over target constant in
    # `img - target`, which zeros can never catch. Perturbed so the loss
    # and grads are nonzero.
    from tracer.api import make_render_fn

    target = jnp.asarray(make_render_fn(scene, cfg)(scene, camera)) + 0.05
    params = {"verts": scene.verts,
              "albedo": jnp.asarray(scene.materials.albedo)}
    opt = optax.sgd(1.0)
    step_t = make_grad_step_fn(cfg, opt, scene=scene, camera=camera)
    step_j = make_grad_step_fn(cfg, opt, tiled="off")
    lt, gt = grads_via_sgd(step_t, scene, camera, target, params)
    lj, gj = grads_via_sgd(step_j, scene, camera, target, params)
    print(f"loss tiled={float(lt):.8f} jnp={float(lj):.8f}")
    for key in params:
        a, b = np.asarray(gt[key]), np.asarray(gj[key])
        denom = max(np.linalg.norm(b), 1e-12)
        rel = np.linalg.norm(a - b) / denom
        print(f"{key}: rel-L2 {rel:.2e}  max|jnp| {np.abs(b).max():.3e}")
        assert np.abs(b).max() > 0
        assert rel < 5e-3, f"{key} grads diverge on TPU: {rel}"
    print("TPU_GRAD_PARITY_OK")


if __name__ == "__main__":
    main()
