import jax.numpy as jnp
import numpy as np

from tracer.core.camera import Camera, generate_rays


def test_rays_unit_and_center_is_forward():
    cam = Camera.make(position=(0, 0, 5), look_at=(0, 0, 0), fov_y_deg=60.0)
    rays = generate_rays(cam, 64, 64)
    norms = np.linalg.norm(np.asarray(rays.d), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    # All origins equal camera position.
    np.testing.assert_allclose(np.asarray(rays.o), np.broadcast_to([0, 0, 5], (64, 64, 3)))
    # Center of the image looks along -z (between the 4 center pixels).
    center_d = np.asarray(rays.d)[31:33, 31:33].mean(axis=(0, 1))
    center_d /= np.linalg.norm(center_d)
    np.testing.assert_allclose(center_d, [0, 0, -1], atol=1e-3)


def test_fov_controls_spread():
    cam_n = Camera.make(position=(0, 0, 5), look_at=(0, 0, 0), fov_y_deg=30.0)
    cam_w = Camera.make(position=(0, 0, 5), look_at=(0, 0, 0), fov_y_deg=90.0)
    d_n = np.asarray(generate_rays(cam_n, 33, 33).d)
    d_w = np.asarray(generate_rays(cam_w, 33, 33).d)
    # Wider fov -> corner ray deviates more from forward.
    fwd = np.array([0, 0, -1.0])
    assert d_w[0, 0] @ fwd < d_n[0, 0] @ fwd


def test_vertical_fov_hits_expected_extent():
    # Ray through the top edge of the image should make angle fov/2 with fwd.
    H = 1001  # odd + large so pixel-center offset is negligible
    cam = Camera.make(position=(0, 0, 1), look_at=(0, 0, 0), fov_y_deg=50.0)
    rays = generate_rays(cam, H, 1)
    top = np.asarray(rays.d)[0, 0]
    ang = np.degrees(np.arccos(top @ np.array([0, 0, -1.0])))
    assert abs(ang - 25.0) < 0.1


def test_jitter_shifts_rays():
    cam = Camera.make(position=(0, 0, 5), look_at=(0, 0, 0))
    r0 = generate_rays(cam, 8, 8)
    r1 = generate_rays(cam, 8, 8, jitter=jnp.full((8, 8, 2), 0.75))
    assert not np.allclose(np.asarray(r0.d), np.asarray(r1.d))


def test_generate_rays_tiled_matches_fold():
    """generate_rays_tiled == generate_rays + tile_rays bit-for-bit (same
    arithmetic, different addressing), including the tiling record."""
    import numpy as np
    from tracer.core.camera import Camera, generate_rays
    from tracer.kernels.traversal import tile_rays, generate_rays_tiled

    cam = Camera.make(position=(0.2, 1.0, 3.0), look_at=(0.0, 0.5, 0.0),
                      fov_y_deg=40.0)
    H, W, tr = 48, 80, 64
    rays = generate_rays(cam, H, W)
    o_ref, d_ref, til_ref = tile_rays(rays.o, rays.d, tr)
    o_t, d_t, til = generate_rays_tiled(cam, H, W, tr)
    np.testing.assert_array_equal(np.asarray(o_ref), np.asarray(o_t))
    np.testing.assert_array_equal(np.asarray(d_ref), np.asarray(d_t))
    assert til == til_ref
