"""Tile/ray data parallelism (SURVEY.md T10): image rows sharded across the
'data' mesh axis, geometry + BVH replicated.

Idiomatic JAX SPMD: annotate the primary-ray wavefront with a
NamedSharding and let XLA partition the whole trace/shade pipeline — every
per-ray op partitions trivially along the ray axis, so no communication
happens until (a) the final image assembly or (b) the gradient psum in the
backward pass (which XLA inserts automatically and overlaps; the explicitly
bucketed/overlapped variant lives in grad_overlap.py).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from tracer.core.camera import Camera, generate_rays
from tracer.core.types import Ray
from tracer.dist.mesh import DATA_AXIS, make_render_mesh
from tracer.render.whitted import WhittedConfig, render_wavefront, make_brute_tracers
from tracer.scene.types import Scene


def shard_rays(rays: Ray, mesh: jax.sharding.Mesh) -> Ray:
    """Constrain the ray wavefront to be row-sharded over the data axis."""
    sh = NamedSharding(mesh, P(DATA_AXIS))
    return Ray(
        o=jax.lax.with_sharding_constraint(rays.o, sh),
        d=jax.lax.with_sharding_constraint(rays.d, sh),
    )


def make_sharded_render_fn(scene: Scene, cfg, mesh: jax.sharding.Mesh, tracer_builder=None):
    """Jitted sharded render: (scene, camera) -> (H, W, 3), H sharded."""
    wcfg = WhittedConfig(max_bounces=cfg.max_bounces, smooth_shading=cfg.smooth_shading)
    builder = tracer_builder or make_brute_tracers

    @jax.jit
    def run(scene: Scene, camera: Camera) -> jax.Array:
        trace_fn, occlude_fn = builder(scene)
        rays = generate_rays(camera, cfg.height, cfg.width)
        rays = shard_rays(rays, mesh)
        return render_wavefront(scene, rays, wcfg, trace_fn, occlude_fn)

    return run


def make_sharded_accel_render_fn(scene: Scene, cfg, mesh: jax.sharding.Mesh,
                                 tracer_builder=None,
                                 reshard_bounces: bool = False):
    """Tile DP through the PRODUCTION accel tier (BASELINE config 4:
    geometry + accel replicated, image rows sharded).

    Unlike make_sharded_render_fn (which annotates a flat wavefront and
    lets GSPMD partition — fine for the brute tracers' per-ray math, but
    the accel tier's tile fold/sort/kernel steps would make XLA insert
    gathers), this uses shard_map: each device generates ONLY its row
    band's rays (generate_rays_band at axis_index * band), builds the same
    replicated accel, and runs the full cull + traversal + shading
    pipeline locally — zero communication until the final image assembly.

    reshard_bounces=True enables the Ulysses-analog variant (SURVEY.md
    §5d, dist.ulysses): before every bounce after the first, the global
    wavefront is all-to-all re-sharded by morton locality of the bounce
    origins, traced/shaded on whichever device owns that region of the
    key range, and the per-ray contributions (plus continuation state)
    are exchanged back to the owning pixels. Exact — only the placement
    of work moves.
    """
    from functools import partial as _partial

    from tracer.render.whitted import bounce_step

    wcfg = WhittedConfig(max_bounces=cfg.max_bounces,
                         smooth_shading=cfg.smooth_shading)
    if tracer_builder is None:
        from tracer.api import build_tracers

        tracer_builder = _partial(build_tracers, cfg=cfg)
    n = mesh.shape[DATA_AXIS]
    if cfg.height % n:
        raise ValueError(f"height {cfg.height} not divisible by data={n}")
    band = cfg.height // n

    def body(scene: Scene, camera: Camera):
        from tracer.core.camera import generate_rays_band

        y0 = jax.lax.axis_index(DATA_AXIS) * band
        rays = generate_rays_band(camera, cfg.height, cfg.width, y0, band)
        trace_fn, occlude_fn = tracer_builder(scene)
        if not reshard_bounces:
            return render_wavefront(scene, rays, wcfg, trace_fn, occlude_fn)

        from tracer.dist.ulysses import reshard_rays_by_position

        lo = jnp.min(scene.verts, axis=0)
        hi = jnp.max(scene.verts, axis=0)
        o = rays.o.reshape(-1, 3)
        d = rays.d.reshape(-1, 3)
        r = o.shape[0]
        radiance = jnp.zeros((r, 3), jnp.float32)
        throughput = jnp.ones((r, 3), jnp.float32)
        live = jnp.ones((r,), bool)
        for bounce in range(wcfg.max_bounces):
            if bounce == 0:
                contrib, nray, throughput, live = bounce_step(
                    scene, Ray(o=o, d=d), throughput, live, wcfg,
                    trace_fn, occlude_fn)
                o, d = nray.o, nray.d
            else:
                aux = [throughput[:, 0], throughput[:, 1], throughput[:, 2],
                       live.astype(jnp.float32)]
                o2, d2, aux2, restore = reshard_rays_by_position(
                    o, d, aux, lo, hi)
                thr2 = jnp.stack(aux2[0:3], axis=-1)
                live2 = aux2[3] > 0.5
                contrib2, nray2, thr3, live3 = bounce_step(
                    scene, Ray(o=o2, d=d2), thr2, live2, wcfg,
                    trace_fn, occlude_fn)
                back = restore([
                    contrib2[:, 0], contrib2[:, 1], contrib2[:, 2],
                    nray2.o[:, 0], nray2.o[:, 1], nray2.o[:, 2],
                    nray2.d[:, 0], nray2.d[:, 1], nray2.d[:, 2],
                    thr3[:, 0], thr3[:, 1], thr3[:, 2],
                    live3.astype(jnp.float32)])
                contrib = jnp.stack(back[0:3], axis=-1)
                o = jnp.stack(back[3:6], axis=-1)
                d = jnp.stack(back[6:9], axis=-1)
                throughput = jnp.stack(back[9:12], axis=-1)
                live = back[12] > 0.5
            radiance = radiance + contrib
        return radiance.reshape(band, cfg.width, 3)

    shard_body = jax.shard_map(
        body, mesh=mesh, in_specs=(P(), P()), out_specs=P(DATA_AXIS))

    @jax.jit
    def run(scene: Scene, camera: Camera) -> jax.Array:
        return shard_body(scene, camera)

    return run


def make_sharded_grad_fn(scene: Scene, cfg, mesh: jax.sharding.Mesh, tracer_builder=None):
    """Jitted sharded loss+grad w.r.t. vertex positions: the pixel loss is a
    mean over sharded rays, so XLA emits the cross-chip grad reduction
    (psum) inside the backward pass."""
    import dataclasses as dc

    wcfg = WhittedConfig(max_bounces=cfg.max_bounces, smooth_shading=cfg.smooth_shading)
    builder = tracer_builder or make_brute_tracers

    @jax.jit
    def step(scene: Scene, camera: Camera, target: jax.Array):
        def loss_fn(verts):
            s = dc.replace(scene, verts=verts)
            trace_fn, occlude_fn = builder(s)
            rays = generate_rays(camera, cfg.height, cfg.width)
            rays = shard_rays(rays, mesh)
            img = render_wavefront(s, rays, wcfg, trace_fn, occlude_fn)
            return jnp.mean((img - target) ** 2)

        return jax.value_and_grad(loss_fn)(scene.verts)

    return step


def dryrun(devices) -> None:
    """One sharded render + one sharded grad step on tiny shapes.

    Used by __graft_entry__.dryrun_multichip on a virtual CPU mesh to prove
    the multi-chip sharding compiles and executes.
    """
    import numpy as np

    from tracer.api import get_scene
    from tracer.utils.config import load_config

    n = len(devices)
    mesh = make_render_mesh(devices, data=n, geom=1)
    # Tiny but sharded-divisible image.
    cfg = load_config("cornell256", height=8 * n, width=16)
    scene, camera = get_scene(cfg)

    run = make_sharded_render_fn(scene, cfg, mesh)
    img = run(scene, camera)
    img.block_until_ready()
    assert img.shape == (cfg.height, cfg.width, 3)

    step = make_sharded_grad_fn(scene, cfg, mesh)
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    loss, grads = step(scene, camera, target)
    loss.block_until_ready()
    assert grads.shape == scene.verts.shape
    assert bool(jnp.isfinite(loss)), "non-finite loss in sharded grad step"

    # Bucketed overlapped gradient all-reduce (T12).
    from tracer.dist.grad_overlap import make_overlapped_grad_fn

    bucketed = make_overlapped_grad_fn(cfg, mesh, n_buckets=2)
    loss_b, grads_b = bucketed(scene, camera, target)
    loss_b.block_until_ready()
    assert bool(jnp.isfinite(loss_b))
    assert grads_b.shape == scene.verts.shape

    # Ulysses-analog bounce re-shard (optional T11 variant, dist.ulysses):
    # all-to-all the bounce wavefront by morton locality.
    cfg3 = load_config("cornell256", height=8 * n, width=16, max_bounces=2)
    resh = make_sharded_accel_render_fn(
        scene, cfg3, mesh, tracer_builder=lambda s: make_brute_tracers(s),
        reshard_bounces=True)
    img_u = resh(scene, camera)
    img_u.block_until_ready()
    assert img_u.shape == (cfg3.height, cfg3.width, 3)

    # Sharded-geometry tier (T11): ring (rays on data x geom, geometry
    # rotating over geom) and pmin-reduce variants on a 2D mesh, brute and
    # cluster-accel per-shard tiers.
    if n % 2 == 0 and n >= 4:
        from tracer.dist.ring import make_ring_render_fn

        mesh2 = make_render_mesh(devices, data=n // 2, geom=2)
        for use_ring in (True, False):
            ring_run = make_ring_render_fn(scene, cfg, mesh2, use_ring=use_ring)
            img2 = ring_run(scene, camera)
            img2.block_until_ready()
            assert img2.shape == (cfg.height, cfg.width, 3)
        accel_run = make_ring_render_fn(scene, cfg, mesh2, use_ring=True,
                                        use_accel=True)
        img3 = accel_run(scene, camera)
        img3.block_until_ready()
        assert img3.shape == (cfg.height, cfg.width, 3)
