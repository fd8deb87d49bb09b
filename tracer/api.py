"""User-facing API: render / grad_step / benchmark.

Reference parity: this layer replaces the reference's `main()` + window loop
(SURVEY.md R8, layer L8) with a headless, jit-compiled API and CLI
(bin/trace, bin/bench). "Real-time" is demonstrated by frame-sequence
rendering at benchmark rates rather than an interactive window.
"""
from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tracer.core.camera import Camera, generate_rays
from tracer.render.whitted import WhittedConfig, render_wavefront, make_brute_tracers
from tracer.scene import cornell_box, bunny_scene, columned_hall, random_tri_soup, load_obj
from tracer.scene.types import Scene
from tracer.utils.config import RenderConfig, load_config


def get_scene(cfg: RenderConfig) -> tuple[Scene, Camera]:
    """Resolve the scene + canonical camera named by the config."""
    if cfg.scene == "cornell":
        scene, cam = cornell_box()
    elif cfg.scene == "bunny":
        scene, cam = bunny_scene(subdiv=cfg.scene_arg or 5)
    elif cfg.scene == "hall":
        scale = max(cfg.scene_arg, 0)
        scene, cam = columned_hall(
            cols_x=12 * (1 + scale), cols_z=8 * (1 + scale), blob_subdiv=4 + (1 if scale else 0)
        )
    elif cfg.scene == "bench":
        from tracer.scene.procedural import bench_scene

        scene, cam = bench_scene()
    elif cfg.scene == "soup":
        scene = random_tri_soup(cfg.scene_arg or 1024)
        cam = dict(position=(0.0, 0.5, 3.0), look_at=(0.0, 0.0, 0.0), fov_y_deg=45.0)
    elif cfg.scene.startswith("obj:"):
        scene = load_obj(cfg.scene[4:])
        lo = np.asarray(scene.verts).min(0)
        hi = np.asarray(scene.verts).max(0)
        c = (lo + hi) / 2
        cam = dict(
            position=tuple(c + np.array([0.0, 0.3, 1.2]) * np.linalg.norm(hi - lo)),
            look_at=tuple(c),
            fov_y_deg=45.0,
        )
    else:
        raise ValueError(f"unknown scene '{cfg.scene}'")
    return scene, Camera.make(**cam)


# Clusters whose packed intersection matrices still fit VMEM alongside the
# kernel's working set (v2 keeps the whole scene resident on-chip): the
# packed-pair layout costs ~6.1 KB/cluster against the 16 MB scoped-vmem
# budget, so 2048 clusters (~262k tris at C=128) leaves ~3.5 MB for blocks
# and scratch. Beyond this the v1 HBM-streamed work-list tier takes over
# (measured 4.6M rays/s at 247k tris/1080p — PERF_NOTES.md tier table).
_VMEM_RESIDENT_CLUSTERS = 2048


def build_tracers(scene: Scene, cfg: RenderConfig):
    """Pick the tracing backend: brute force, jnp BVH, or Pallas BVH."""
    if cfg.use_bvh:
        from tracer.bvh import build_scene_accel
        from tracer.kernels import make_accel_tracers
        from tracer.kernels.traversal2 import make_sorted_tracers

        # Pallas (Mosaic) kernels only exist on TPU; everywhere else the
        # jnp cluster path is the same algorithm compiled by XLA.
        use_pallas = cfg.use_pallas and jax.default_backend() == "tpu"
        accel = build_scene_accel(scene)
        if use_pallas and accel.num_clusters <= _VMEM_RESIDENT_CLUSTERS:
            # v2: per-tile front-to-back scan with early termination,
            # geometry VMEM-resident (kernels.traversal2).
            return make_sorted_tracers(scene, accel)
        return make_accel_tracers(scene, accel, use_pallas=use_pallas)
    return make_brute_tracers(scene)


def _whitted_cfg(cfg: RenderConfig) -> WhittedConfig:
    return WhittedConfig(max_bounces=cfg.max_bounces, smooth_shading=cfg.smooth_shading)


def _use_tiled_path(scene: Scene, cfg: RenderConfig) -> bool:
    n_clusters = -(-scene.num_tris // 128)
    return (cfg.use_bvh and cfg.use_pallas and jax.default_backend() == "tpu"
            and n_clusters <= _VMEM_RESIDENT_CLUSTERS)


def make_render_fn(scene: Scene, cfg: RenderConfig):
    """Build the jitted (scene, camera) -> image function for this config.

    The scene geometry is a traced argument (differentiable); tracer choice
    and image size are static.
    """
    wcfg = _whitted_cfg(cfg)

    if _use_tiled_path(scene, cfg):
        from tracer.bvh import build_scene_accel
        from tracer.render.tiled import render_tiled, K_CLOSEST, S_CAP
        from tracer.kernels.traversal2 import DEFAULT_K

        build = jax.jit(build_scene_accel)

        def build_run(caps):
            kc, k, s, split, sh_split = caps

            @jax.jit
            def run_tiled(scene: Scene, accel, camera: Camera):
                return render_tiled(scene, accel, camera, cfg.height,
                                    cfg.width, wcfg, with_aux=True,
                                    k_closest=kc, k_cap=k, s_cap=s,
                                    closest_split=split,
                                    shadow_split=sh_split)

            return run_tiled

        # The accel is built at scene load and reused across frames (the
        # reference builds its BVH once in main(), SURVEY.md §3.1 A); a new
        # scene object triggers a rebuild — and a cap-sizing pass: the k/s
        # candidate caps are escalated from the measured per-tile needs
        # until the first frame reports zero cull overflow, making silent
        # geometry truncation structurally impossible for static scenes
        # (VERDICT r3 weak #2/#8). A camera moving later can still
        # overflow; aux['overflow'] stays exposed and bench fails on it.
        state = {"scene": None, "accel": None,
                 "caps": (K_CLOSEST, DEFAULT_K, S_CAP, None, None),
                 "run": None}

        def _size_caps(scene, accel, camera):
            n_cl = accel.num_clusters
            n_sc = accel.super_lo.shape[0]
            n_tiles = -(-cfg.height * cfg.width // 64)
            r8 = lambda v: max(8, -(-int(v) // 8) * 8)
            for it in range(6):
                if state["run"] is None:
                    state["run"] = build_run(state["caps"])
                img, aux = state["run"](scene, accel, camera)
                overflowed = int(aux["overflow"]) != 0
                kc, k, s, split, sh_split = state["caps"]
                # First frame also measures the tile count distributions
                # for the closest three-tier partition (trace_tiles_split)
                # and the batch-graded any-hit (any_hit_tiles_graded); +8
                # slack keeps tiny count jitter from forcing a recompile.
                want_split = (min(r8(aux["need_split"]) + 8, n_tiles),
                              min(r8(aux["need_zero"]) + 8, n_tiles))
                want_sh = (min(r8(aux["need_sh_b1"]) + 8, n_tiles),
                           min(r8(aux["need_sh_zero"]) + 8, n_tiles))
                if not overflowed and split is not None and sh_split is not None:
                    return
                if overflowed:
                    # need_s is EXACT (stage 1 is measured untruncated);
                    # the k needs are exact once s covers need_s and only
                    # lower bounds before that — but then the next
                    # iteration re-measures them under the wider s, so
                    # monotone escalation to the measured need converges
                    # without blanket doubling (which paid 2x stage-2
                    # cull width for a handful of overflow candidates).
                    kc = min(max(r8(aux["need_closest"]), kc), n_cl)
                    k = min(max(r8(aux["need_shadow"]), k), n_cl)
                    s = min(max(int(aux["need_s"]) + 2, s), n_sc)
                # A measured split too narrow for this frame: widen
                # monotonically (never shrink mid-scene).
                if split is not None:
                    want_split = (max(want_split[0], split[0]),
                                  max(want_split[1], split[1]))
                if sh_split is not None:
                    want_sh = (max(want_sh[0], sh_split[0]),
                               max(want_sh[1], sh_split[1]))
                import sys

                print(f"[tracer] sizing (overflow {int(aux['overflow'])}): "
                      f"caps {state['caps']} -> "
                      f"{(kc, k, s, want_split, want_sh)}", file=sys.stderr)
                state["caps"] = (kc, k, s, want_split, want_sh)
                state["run"] = build_run(state["caps"])
            raise RuntimeError(
                f"cap sizing did not converge (caps={state['caps']})")

        def run(scene: Scene, camera: Camera, with_aux: bool = False):
            if state["scene"] is not scene:
                state["accel"] = build(scene)
                state["scene"] = scene
                _size_caps(scene, state["accel"], camera)
            img, aux = state["run"](scene, state["accel"], camera)
            return (img, aux) if with_aux else img

        return run

    trace_fn_builder = partial(build_tracers, cfg=cfg)

    @jax.jit
    def run(scene: Scene, camera: Camera) -> jax.Array:
        trace_fn, occlude_fn = trace_fn_builder(scene)
        rays = generate_rays(camera, cfg.height, cfg.width)
        return render_wavefront(scene, rays, wcfg, trace_fn, occlude_fn)

    return run


def render(config: str | RenderConfig | None = None, **overrides) -> np.ndarray:
    """One-call render: resolve config -> scene -> jit -> (H, W, 3) float32."""
    cfg = config if isinstance(config, RenderConfig) else load_config(config, **overrides)
    scene, camera = get_scene(cfg)
    run = make_render_fn(scene, cfg)
    return np.asarray(run(scene, camera))


def make_grad_step_fn(cfg: RenderConfig, optimizer):
    """Jitted (scene, camera, target, params, opt_state) ->
    (loss, params, opt_state) optimization step of the image MSE w.r.t.
    scene params. `params` selects what is optimized: dict with optional
    keys 'verts', 'albedo', 'cam_pos'. Used by the inverse-rendering loop
    (tracer.diff.fit, BASELINE config 3)."""
    import optax

    wcfg = _whitted_cfg(cfg)

    @jax.jit
    def step(scene: Scene, camera: Camera, target: jax.Array, params, opt_state):
        def loss_fn(p):
            import dataclasses as dc

            s = scene
            if "verts" in p:
                s = dc.replace(s, verts=p["verts"])
            if "albedo" in p:
                s = dc.replace(s, materials=dc.replace(s.materials, albedo=p["albedo"]))
            cam = camera
            if "cam_pos" in p:
                cam = dc.replace(cam, position=p["cam_pos"])
            trace_fn, occlude_fn = build_tracers(s, cfg)
            rays = generate_rays(cam, cfg.height, cfg.width)
            img = render_wavefront(s, rays, wcfg, trace_fn, occlude_fn)
            return jnp.mean((img - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return loss, new_params, new_opt_state

    return step


# Compiled-step cache for the grad_step convenience wrapper: without it a
# Python loop over grad_step would rebuild a fresh @jax.jit closure (and
# recompile the full render+backward graph) every iteration. Keyed on the
# frozen config + optimizer identity (optax transforms are NamedTuples of
# functions — hashable). Loops should still prefer make_grad_step_fn.
_GRAD_STEP_CACHE: dict = {}
_DEFAULT_ADAM = None


def grad_step(scene: Scene, camera: Camera, target: jax.Array, cfg: RenderConfig,
              optimizer=None, opt_state=None, params=None):
    """One optimization step (convenience wrapper over make_grad_step_fn).

    Returns (loss, new_params, new_opt_state)."""
    import optax

    global _DEFAULT_ADAM
    if params is None:
        params = {"verts": scene.verts}
    if optimizer is None:
        if _DEFAULT_ADAM is None:
            _DEFAULT_ADAM = optax.adam(1e-3)
        optimizer = _DEFAULT_ADAM
    if opt_state is None:
        opt_state = optimizer.init(params)
    key = (cfg, optimizer)
    step = _GRAD_STEP_CACHE.get(key)
    if step is None:
        step = _GRAD_STEP_CACHE[key] = make_grad_step_fn(cfg, optimizer)
    return step(scene, camera, target, params, opt_state)


def benchmark(config: str | RenderConfig | None = None, iters: int = 10,
              warmup: int = 2, **overrides) -> dict:
    """Timed forward renders -> rays/s and ms/frame."""
    cfg = config if isinstance(config, RenderConfig) else load_config(config, **overrides)
    scene, camera = get_scene(cfg)
    run = make_render_fn(scene, cfg)
    img = run(scene, camera)
    img.block_until_ready()
    for _ in range(max(warmup - 1, 0)):
        run(scene, camera).block_until_ready()
    from tracer.utils.metrics import profile_trace

    # Pipelined throughput timing with a sync that cannot lie: frames are
    # enqueued back to back (device executes them in order), then ONE
    # scalar host readback of the LAST frame's checksum proves the whole
    # batch finished. block_until_ready alone is not trusted here — on the
    # remote-chip tunnel it was observed returning before execution for
    # some programs (a full 1080p frame "timed" at 0.09 ms).
    checksum = jax.jit(jnp.sum)
    float(checksum(run(scene, camera)))  # sync point before t0
    with profile_trace(cfg.profile):
        t0 = time.perf_counter()
        for _ in range(iters):
            img = run(scene, camera)
        float(checksum(img))
        dt = (time.perf_counter() - t0) / iters
    overflow = None
    if _use_tiled_path(scene, cfg):
        _, aux = run(scene, camera, with_aux=True)
        overflow = int(aux["overflow"])
    primary_rays = cfg.height * cfg.width
    # Count every traced wavefront: per bounce one closest-hit pass plus one
    # shadow pass per light (the standard rays/s accounting for Whitted).
    # `primary_rays_per_s` is the stricter closest-hit-only number.
    rays_per_frame = primary_rays * cfg.max_bounces * (1 + scene.lights.count)
    return {
        "config": cfg,
        "ms_per_frame": dt * 1e3,
        "fps": 1.0 / dt,
        "rays_per_s": rays_per_frame / dt,
        "primary_rays_per_s": primary_rays * cfg.max_bounces / dt,
        "num_tris": scene.num_tris,
        "overflow": overflow,
        "image": np.asarray(img),
    }


def benchmark_grad_step(config: str | RenderConfig | None = "bunny-grad",
                        iters: int = 5, warmup: int = 1,
                        params: tuple = ("verts",), **overrides) -> dict:
    """Timed optimization steps (loss+grad+update) -> grad_step_ms.

    BASELINE.md requires grad-step time measured and reported per config.
    `params` selects the optimized leaves: any of "verts", "albedo",
    "cam_pos" (BASELINE config 3 optimizes all three families).
    """
    import optax

    cfg = config if isinstance(config, RenderConfig) else load_config(config, **overrides)
    scene, camera = get_scene(cfg)
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    optimizer = optax.adam(1e-3)
    p = {}
    if "verts" in params:
        p["verts"] = scene.verts
    if "albedo" in params:
        p["albedo"] = jnp.asarray(scene.materials.albedo)
    if "cam_pos" in params:
        p["cam_pos"] = jnp.asarray(camera.position)
    params = p
    opt_state = optimizer.init(params)
    step = make_grad_step_fn(cfg, optimizer)
    for _ in range(max(warmup, 1)):
        loss, params, opt_state = step(scene, camera, target, params, opt_state)
        jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        loss, params, opt_state = step(scene, camera, target, params, opt_state)
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / iters
    return {"grad_step_ms": dt * 1e3, "loss": float(loss), "config": cfg}
