"""Custom-VJP saved-hit-id replay (SURVEY.md T6, §3.2 D): the O(R) backward
must produce the same gradients as differentiating through the dense
(R x T) intersection."""
import jax
import jax.numpy as jnp
import numpy as np

from tracer.core.intersect import (intersect_packed, nearest_hit,
                                   triangle_affine_maps)
from tracer.core.types import Ray, T_FAR
from tracer.diff.vjp import intersect_nearest
from tracer.api import get_scene
from tracer.utils.config import load_config


def _scene_rays(n=64):
    scene, cam = get_scene(load_config("cornell256", height=8, width=8))
    from tracer.core.camera import generate_rays

    rays = generate_rays(cam, 8, 8)
    return scene, rays.o.reshape(-1, 3), rays.d.reshape(-1, 3)


def _dense_ref(o, d, verts, tris):
    """Reference: differentiate straight through the dense packed path."""
    ones = jnp.ones(o.shape[:-1] + (1,), o.dtype)
    o4 = jnp.concatenate([o, ones], axis=-1)
    d4 = jnp.concatenate([d, jnp.zeros_like(ones)], axis=-1)
    maps = triangle_affine_maps(verts, tris)
    t, u, v, _ = intersect_packed(o4, d4, maps, 1e-4, T_FAR)
    hit = nearest_hit(t, u, v)
    return hit.t, hit.uv


def test_forward_matches_dense():
    scene, o, d = _scene_rays()
    t, tri, uv = jax.jit(
        lambda *a: intersect_nearest(*a))(o, d, scene.verts, scene.tris)
    t_ref, uv_ref = jax.jit(_dense_ref)(o, d, scene.verts, scene.tris)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_ref))
    np.testing.assert_allclose(np.asarray(uv), np.asarray(uv_ref))


def test_replay_grads_match_dense_grads():
    scene, o, d = _scene_rays()

    def loss_replay(verts, o, d):
        t, tri, uv = intersect_nearest(o, d, verts, scene.tris)
        m = (t < T_FAR).astype(jnp.float32)
        return jnp.sum(m * jnp.minimum(t, 1e3)) + jnp.sum(uv ** 2)

    def loss_dense(verts, o, d):
        t, uv = _dense_ref(o, d, verts, scene.tris)
        m = (t < T_FAR).astype(jnp.float32)
        return jnp.sum(m * jnp.minimum(t, 1e3)) + jnp.sum(uv ** 2)

    for argnum, name in ((0, "verts"), (1, "o"), (2, "d")):
        g_r = np.asarray(jax.jit(jax.grad(loss_replay, argnum))(
            scene.verts, o, d))
        g_d = np.asarray(jax.jit(jax.grad(loss_dense, argnum))(
            scene.verts, o, d))
        np.testing.assert_allclose(
            g_r, g_d, rtol=2e-4, atol=1e-5,
            err_msg=f"replay grad w.r.t. {name} != dense grad")
        assert np.abs(g_r).max() > 0, f"zero gradient w.r.t. {name}"
