"""Edge-aware visibility gradients (SURVEY.md T6, L4).

Reference parity: the OpenCL reference is non-differentiable; this layer is
the new scope mandated by BASELINE ("differentiable: gradients of pixel
colors w.r.t. scene parameters ... edge-aware reparameterization for
visibility gradients").

Why it is needed: hit/miss and shadow occlusion are step functions of scene
geometry, so naive autodiff through `render_wavefront` yields exactly zero
gradient for any parameter whose only effect is moving a visibility boundary
(e.g. translating an occluder between a light and a receiver). The true
derivative is a boundary (silhouette) integral.

Mechanism — smoothed-indicator reparameterization (SoftRas-class): every
hard hit indicator is paired with a smooth companion

    s = sigmoid(m / eps),   m = signed WORLD-SPACE distance from the
                            ray/plane intersection point to the nearest
                            triangle edge (positive inside)

and combined straight-through: `soft + stop_grad(hard - soft)` — the forward
value stays the exact hard render (bit-identical images), while the backward
pass sees the smooth function whose derivative concentrates mass in an
eps-band around the silhouette, approximating the boundary integral. The
world-space margin (barycentric margin rescaled by the triangle's edge
heights 2A/|edge|) makes the gradient magnitude independent of triangulation
density, which is what lets it match finite differences quantitatively
(tests/grad/test_edge.py).

This module is brute-force over (rays x tris) — it is the *gradient oracle*
tier, used on optimization-sized scenes (BASELINE config 3) and to validate
the piecewise-smooth gradients that flow through the BVH/Pallas production
path (whose hit selection is piecewise constant; see render/tiled.py).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tracer.core.types import Ray, normalize, T_FAR, RAY_EPS
from tracer.core.intersect import moller_trumbore
from tracer.render.whitted import WhittedConfig
from tracer.scene.types import Scene


def _straight_through(hard: jax.Array, soft: jax.Array) -> jax.Array:
    """Value = hard, gradient = d(soft)."""
    return soft + jax.lax.stop_gradient(hard.astype(soft.dtype) - soft)


def edge_heights(verts: jax.Array, tris: jax.Array) -> jax.Array:
    """(T, 3) world-space heights: h[k] = 2*area / |edge opposite vertex k|.

    Converts a barycentric margin into perpendicular world distance to the
    corresponding edge: dist_to_edge_opposite_k = bary_k * h[k].
    """
    v0 = verts[tris[:, 0]]
    v1 = verts[tris[:, 1]]
    v2 = verts[tris[:, 2]]
    twoA = jnp.linalg.norm(jnp.cross(v1 - v0, v2 - v0), axis=-1)  # (T,)
    l0 = jnp.linalg.norm(v2 - v1, axis=-1)  # edge opposite v0
    l1 = jnp.linalg.norm(v2 - v0, axis=-1)  # opposite v1
    l2 = jnp.linalg.norm(v1 - v0, axis=-1)  # opposite v2
    lens = jnp.stack([l0, l1, l2], axis=-1)
    return twoA[:, None] / jnp.maximum(lens, 1e-20)


def _pair_margins(ray: Ray, verts, tris, t_min, t_max, eps: float = 1e-12):
    """All (ray x tri) pairs -> (hard_hit, world_margin, t_plane).

    hard_hit: the exact hit indicator (same predicate as moller_trumbore).
    world_margin: signed distance (in world units) from the ray/plane
    intersection to the nearest edge of the triangle; positive inside.
    t_plane: the RAW ray/plane intersection parameter, defined for every
    non-degenerate triangle whether or not the barycentric test passes —
    the soft gates below must see near-miss (outside-the-edge) triangles,
    so they cannot use moller_trumbore's hit-gated t (which is T_FAR for
    every miss and would make silhouette gradients one-sided).
    Shapes: ray batch (...,), tris (T,) -> outputs (..., T).
    """
    v0 = verts[tris[:, 0]]
    v1 = verts[tris[:, 1]]
    v2 = verts[tris[:, 2]]
    e1 = v1 - v0
    e2 = v2 - v0
    o = ray.o[..., None, :]  # (..., 1, 3)
    d = ray.d[..., None, :]
    pvec = jnp.cross(d, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    nondeg = jnp.abs(det) > eps
    inv_det = jnp.where(nondeg, 1.0 / jnp.where(det == 0, 1.0, det), 0.0)
    tvec = o - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(d * qvec, axis=-1) * inv_det
    t_plane = jnp.where(nondeg, jnp.sum(e2 * qvec, axis=-1) * inv_det, T_FAR)
    hit = (nondeg & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
           & (t_plane > t_min) & (t_plane < t_max))
    w = 1.0 - u - v
    h = edge_heights(verts, tris)  # (T, 3)
    margin = jnp.minimum(jnp.minimum(w * h[:, 0], u * h[:, 1]), v * h[:, 2])
    return hit, margin, t_plane


def soft_any_hit(ray: Ray, verts, tris, t_max, edge_eps: float,
                 t_min: float = RAY_EPS):
    """Occlusion with edge-aware gradient. Returns float occlusion in [0,1]:
    forward value is the exact hard any-hit; backward is the smooth union
    1 - prod(1 - sigmoid(margin/eps)) over in-t-range triangles."""
    if isinstance(t_max, jax.Array) and t_max.ndim > 0:
        t_max_b = t_max[..., None]
    else:
        t_max_b = t_max
    hit, margin, t_plane = _pair_margins(ray, verts, tris, t_min, T_FAR)
    # The t-range gate stays hard (contact discontinuities are measure-zero
    # for the silhouette term this approximates); detach it. It is evaluated
    # on the RAW plane t so triangles the ray narrowly misses (outside the
    # edge, margin < 0) still contribute their sigmoid tail — that is what
    # makes the silhouette gradient two-sided.
    in_range = jax.lax.stop_gradient((t_plane > t_min) & (t_plane < t_max_b))
    s = jax.nn.sigmoid(margin / edge_eps) * in_range
    soft_occ = 1.0 - jnp.prod(1.0 - s, axis=-1)
    hard_occ = jnp.any(hit & in_range, axis=-1)
    return _straight_through(hard_occ, soft_occ)


def soft_coverage(ray: Ray, verts, tris, edge_eps: float,
                  t_min: float = RAY_EPS):
    """Primary-visibility coverage alpha with edge-aware gradient: 1 where
    the ray hits anything (exact), gradient from the smooth union."""
    hit, margin, t_plane = _pair_margins(ray, verts, tris, t_min, T_FAR)
    # Raw-plane-t gate (detached): every triangle whose supporting plane is
    # crossed in front of the ray contributes its sigmoid band, inside OR
    # outside the edge — two-sided silhouette gradients.
    in_front = jax.lax.stop_gradient((t_plane > t_min) & (t_plane < T_FAR))
    s = jax.nn.sigmoid(margin / edge_eps) * in_front
    soft = 1.0 - jnp.prod(1.0 - s, axis=-1)
    hard = jnp.any(hit, axis=-1)
    return _straight_through(hard, soft)


def render_diff(scene: Scene, ray: Ray, cfg: WhittedConfig,
                edge_eps: float = 1e-2) -> jax.Array:
    """Whitted integrator with edge-aware visibility gradients.

    Identical forward values to render_wavefront with the brute tracers
    (the straight-through estimators do not change the image); the backward
    pass additionally carries silhouette terms through (a) shadow-ray
    occlusion and (b) primary hit/miss coverage against the sky.
    Brute-force (rays x tris) — gradient-oracle tier for optimization-size
    scenes; use small wavefronts.
    """
    from tracer.core import intersect as ci
    from tracer.render.whitted import shading_frame

    sky = jnp.asarray(cfg.sky_color, jnp.float32)
    radiance = jnp.zeros(ray.batch_shape + (3,), jnp.float32)
    throughput = jnp.ones(ray.batch_shape + (3,), jnp.float32)
    live = jnp.ones(ray.batch_shape, bool)

    for bounce in range(cfg.max_bounces):
        hit = ci.intersect_brute(ray, scene.verts, scene.tris)
        valid = hit.valid & live
        p, n, mat = shading_frame(scene, ray, hit, cfg.smooth_shading)
        albedo = scene.materials.albedo[mat]
        emission = scene.materials.emission[mat]
        mirror = scene.materials.mirror[mat][..., None]
        spec = scene.materials.specular[mat]
        shin = scene.materials.shininess[mat]

        from tracer.render.whitted import phong_specular

        direct = jnp.zeros_like(p)
        for li in range(scene.lights.count):
            lpos = scene.lights.position[li]
            lint = scene.lights.intensity[li]
            to_l = lpos - p
            dist2 = jnp.sum(to_l * to_l, axis=-1)
            dist = jnp.sqrt(jnp.maximum(dist2, 1e-20))
            wi = to_l / dist[..., None]
            cos = jnp.maximum(jnp.sum(n * wi, axis=-1), 0.0)
            sray = Ray(o=p + n * RAY_EPS, d=wi)
            occ = soft_any_hit(sray, scene.verts, scene.tris,
                               dist - 2 * RAY_EPS, edge_eps)
            vis = (1.0 - occ) * valid
            falloff = (vis / jnp.maximum(dist2, 1e-20))[..., None] * lint
            brdf = (albedo / jnp.pi * cos[..., None]
                    + phong_specular(ray.d, n, wi, spec, shin)[..., None])
            direct = direct + brdf * falloff

        local = emission + albedo * cfg.ambient + direct
        # Edge-aware hit-vs-sky blending on the primary wavefront.
        alpha = soft_coverage(ray, scene.verts, scene.tris, edge_eps)
        alpha = jnp.where(live, alpha, 0.0)
        surf = jnp.where(valid[..., None], local * (1.0 - mirror), 0.0)
        radiance = radiance + throughput * (
            alpha[..., None] * surf + ((live * (1.0 - alpha)))[..., None] * sky)

        if bounce + 1 < cfg.max_bounces:
            refl_d = ray.d - 2.0 * jnp.sum(ray.d * n, axis=-1, keepdims=True) * n
            ray = Ray(o=p + n * RAY_EPS, d=normalize(refl_d))
            throughput = throughput * mirror
            live = valid & (mirror[..., 0] > 0.0)
    return radiance


def render_diff_image(scene: Scene, camera, height: int, width: int,
                      cfg: WhittedConfig = WhittedConfig(),
                      edge_eps: float = 1e-2) -> jax.Array:
    from tracer.core.camera import generate_rays

    rays = generate_rays(camera, height, width)
    return render_diff(scene, rays, cfg, edge_eps)
