"""Gradient tests (SURVEY.md §4 'Gradient tests'): finite-difference checks
of interior (smooth) gradients and of the edge-aware visibility gradients on
a translating-occluder scene where naive autodiff provably returns zero.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tracer.core.camera import Camera, generate_rays
from tracer.diff import render_diff
from tracer.render.whitted import WhittedConfig, render_wavefront, make_brute_tracers
from tracer.scene.types import Scene, Materials, Lights


def _quad(cx, cy, cz, hx, hz):
    """Axis-aligned horizontal quad centered at (cx, cy, cz)."""
    v = np.array([
        [cx - hx, cy, cz - hz],
        [cx + hx, cy, cz - hz],
        [cx + hx, cy, cz + hz],
        [cx - hx, cy, cz + hz],
    ], np.float32)
    t = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    return v, t


def occluder_scene(dx: float | jax.Array):
    """Ground plane seen top-down; an occluder quad OUTSIDE the camera
    frustum casts a shadow into view. The occluder's x-translation `dx`
    affects the image ONLY through the boolean shadow test -> naive autodiff
    gradient is exactly zero; the true derivative is a boundary integral.
    """
    pv, pt = _quad(0.0, 0.0, 0.0, 1.2, 1.2)       # receiver
    ov, ot = _quad(1.15, 0.6, 0.0, 0.25, 0.5)     # occluder (off-screen)
    verts = jnp.concatenate([jnp.asarray(pv),
                             jnp.asarray(ov) + jnp.array([dx, 0.0, 0.0])])
    tris = jnp.concatenate([jnp.asarray(pt), jnp.asarray(ot) + 4])
    mat_id = jnp.zeros(4, jnp.int32)
    mats = Materials.make(albedo=jnp.full((1, 3), 0.8))
    lights = Lights(position=jnp.array([[2.4, 1.2, 0.0]], jnp.float32),
                    intensity=jnp.array([[6.0, 6.0, 6.0]], jnp.float32))
    normals = jnp.tile(jnp.array([[0.0, 1.0, 0.0]], jnp.float32), (8, 1))
    return Scene(verts=verts, tris=tris, mat_id=mat_id, materials=mats,
                 lights=lights, normals=normals)


# Top-down view: the world-up hint must not be parallel to the view
# direction or the camera basis (cross products) is ill-conditioned and
# position gradients blow up — use a horizontal up hint.
CAM = Camera.make(position=(0.0, 3.0, 1e-3), look_at=(0.0, 0.0, 0.0),
                  up=(0.0, 0.0, -1.0), fov_y_deg=37.0)
CFG = WhittedConfig(max_bounces=1, smooth_shading=False)
H = W = 64


def _hard_loss(dx):
    scene = occluder_scene(dx)
    trace, occ = make_brute_tracers(scene)
    rays = generate_rays(CAM, H, W)
    img = render_wavefront(scene, rays, CFG, trace, occ)
    return jnp.mean(img)


def _edge_loss(dx, edge_eps=0.01):
    scene = occluder_scene(dx)
    rays = generate_rays(CAM, H, W)
    img = render_diff(scene, rays, CFG, edge_eps=edge_eps)
    return jnp.mean(img)


def test_forward_identical():
    """Straight-through estimators must not change the rendered image.

    Tolerance: the diff path classifies hits with textbook Moller-Trumbore
    while the brute path uses the affine-map formulation, so a handful of
    exact-boundary pixels may flip; everywhere else the images must agree.
    """
    img_hard = np.asarray(jax.jit(lambda d: render_wavefront(
        occluder_scene(d), generate_rays(CAM, H, W), CFG,
        *make_brute_tracers(occluder_scene(d))))(0.0))
    img_edge = np.asarray(jax.jit(lambda d: render_diff(
        occluder_scene(d), generate_rays(CAM, H, W), CFG))(0.0))
    mismatch = np.mean(~np.isclose(img_hard, img_edge, rtol=1e-5, atol=1e-6))
    assert mismatch < 3e-3, f"{mismatch:.2%} of pixels differ"
    # The shadow must actually be in view for the test to mean anything.
    assert float(jnp.mean(img_hard)) > 0.01
    lit_frac = float(jnp.mean(img_hard[..., 0] > 0.05))
    assert 0.1 < lit_frac < 0.97, "occluder shadow not visible in frame"


def test_naive_visibility_grad_is_zero():
    g = jax.jit(jax.grad(_hard_loss))(0.0)
    assert abs(float(g)) < 1e-8


def test_edge_grad_matches_finite_differences():
    g = float(jax.jit(jax.grad(_edge_loss))(0.0))
    h = 0.04
    f = jax.jit(_hard_loss)
    fd = (float(f(h)) - float(f(-h))) / (2 * h)
    assert abs(fd) > 1e-5, "test scene degenerate: FD of shadow motion is zero"
    assert np.sign(g) == np.sign(fd)
    # The smoothed-indicator estimator is biased at finite eps; 50% relative
    # agreement with the (itself noisy) hard FD is the meaningful check that
    # the silhouette term has the right magnitude, vs exactly 0 for naive AD.
    assert abs(g - fd) <= 0.5 * abs(fd), f"edge grad {g} vs FD {fd}"


def smooth_scene():
    """A single large plane filling the whole frame: no visible silhouettes,
    so FD of the hard render is exact for interior-gradient checks."""
    pv, pt = _quad(0.0, 0.0, 0.0, 50.0, 50.0)
    mats = Materials.make(albedo=jnp.array([[0.6, 0.5, 0.4]]))
    lights = Lights(position=jnp.array([[0.5, 2.0, 0.3]], jnp.float32),
                    intensity=jnp.array([[4.0, 4.0, 4.0]], jnp.float32))
    normals = jnp.tile(jnp.array([[0.0, 1.0, 0.0]], jnp.float32), (4, 1))
    return Scene(verts=jnp.asarray(pv), tris=jnp.asarray(pt),
                 mat_id=jnp.zeros(2, jnp.int32), materials=mats,
                 lights=lights, normals=normals)


@pytest.mark.parametrize("param", ["albedo", "cam_pos", "light_pos"])
def test_interior_grads_match_fd(param):
    scene = smooth_scene()

    def loss(theta):
        s, cam = scene, CAM
        if param == "albedo":
            s = dataclasses.replace(
                s, materials=dataclasses.replace(
                    s.materials, albedo=s.materials.albedo + theta))
        elif param == "cam_pos":
            cam = dataclasses.replace(
                cam, position=cam.position + jnp.array([theta, 0.0, 0.0]))
        elif param == "light_pos":
            s = dataclasses.replace(
                s, lights=dataclasses.replace(
                    s.lights, position=s.lights.position
                    + jnp.array([[theta, 0.0, 0.0]])))
        rays = generate_rays(cam, 32, 32)
        trace, occ = make_brute_tracers(s)
        img = render_wavefront(s, rays, CFG, trace, occ)
        return jnp.mean(img)

    g = float(jax.jit(jax.grad(loss))(0.0))
    h = 1e-2  # large enough that fp32 rounding doesn't dominate the FD
    f = jax.jit(loss)
    fd = (float(f(h)) - float(f(-h))) / (2 * h)
    assert abs(fd) > 1e-7
    # atol term: FD of an fp32 image mean has ~1e-5 noise floor.
    np.testing.assert_allclose(g, fd, rtol=3e-2, atol=2e-5)


def test_vertex_grads_flow_through_diff_renderer():
    """Vertex gradients through render_diff are finite and nonzero."""
    def loss(verts):
        s = dataclasses.replace(occluder_scene(0.0), verts=verts)
        rays = generate_rays(CAM, 32, 32)
        return jnp.mean(render_diff(s, rays, CFG))

    scene = occluder_scene(0.0)
    g = jax.jit(jax.grad(loss))(scene.verts)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.max(jnp.abs(g))) > 0.0
