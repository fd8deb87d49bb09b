"""Pinhole camera and primary-ray generation.

Reference parity: the OpenCL reference computes one primary ray per pixel in
the render kernel from a pinhole camera (SURVEY.md R1, BASELINE capability
"camera ray generation"). Here ray generation is a pure, differentiable jnp
function over the whole image at once — position/orientation gradients flow
through it (needed for camera-pose optimization, BASELINE config 3).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tracer.core.types import Ray, normalize


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """Pinhole camera.

    position: (3,) eye point.
    look_at:  (3,) target point.
    up:       (3,) world up hint.
    fov_y:    scalar vertical field of view in radians.
    """

    position: jax.Array
    look_at: jax.Array
    up: jax.Array
    fov_y: jax.Array

    @staticmethod
    def make(position, look_at, up=(0.0, 1.0, 0.0), fov_y_deg=45.0) -> "Camera":
        f32 = lambda x: jnp.asarray(x, jnp.float32)
        return Camera(
            position=f32(position),
            look_at=f32(look_at),
            up=f32(up),
            fov_y=f32(jnp.deg2rad(fov_y_deg)),
        )

    def basis(self) -> tuple[jax.Array, jax.Array, jax.Array]:
        """Right-handed view basis (right, up, forward)."""
        fwd = normalize(self.look_at - self.position)
        right = normalize(jnp.cross(fwd, self.up))
        up = jnp.cross(right, fwd)
        return right, up, fwd


def generate_rays(camera: Camera, height: int, width: int, jitter: jax.Array | None = None) -> Ray:
    """Primary rays for an H x W image, SoA layout (H, W, 3).

    Pixel (0, 0) is the top-left corner; rays pass through pixel centers.
    `jitter` is an optional (H, W, 2) in [0,1) sub-pixel offset (for AA /
    stochastic edge sampling in the differentiable path).
    """
    return generate_rays_band(camera, height, width, 0, height, jitter)


def generate_rays_band(camera: Camera, height: int, width: int,
                       y0, band_h: int,
                       jitter: jax.Array | None = None) -> Ray:
    """Rays for the horizontal band of rows [y0, y0 + band_h) of an
    H x W image — same arithmetic as generate_rays restricted to the band.

    `y0` may be a traced scalar (e.g. axis_index * band inside shard_map),
    which is how the tile-DP tier generates each device's rays locally with
    zero communication (dist.ray_dp.make_sharded_accel_render_fn)."""
    right, up, fwd = camera.basis()
    aspect = width / height
    tan_half = jnp.tan(camera.fov_y * 0.5)

    yy = (jnp.asarray(y0, jnp.float32)
          + jnp.arange(band_h, dtype=jnp.float32))[:, None]
    xx = jnp.arange(width, dtype=jnp.float32)[None, :]
    if jitter is None:
        jx = jy = 0.5
    else:
        jy = jitter[..., 0]
        jx = jitter[..., 1]
    # NDC in [-1, 1], y flipped so +y is up in world space; the divisors
    # stay the FULL image dimensions — the band is a window into it.
    ndc_x = ((xx + jx) / width * 2.0 - 1.0) * aspect * tan_half
    ndc_y = (1.0 - (yy + jy) / height * 2.0) * tan_half

    d = (
        ndc_x[..., None] * right
        + ndc_y[..., None] * up
        + jnp.broadcast_to(fwd, (band_h, width, 3))
    )
    o = jnp.broadcast_to(camera.position, (band_h, width, 3))
    return Ray(o=o, d=normalize(d))
