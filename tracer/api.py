"""User-facing API: render / grad_step / benchmark.

Reference parity: this layer replaces the reference's `main()` + window loop
(SURVEY.md R8, layer L8) with a headless, jit-compiled API and CLI
(bin/trace, bin/bench). "Real-time" is demonstrated by frame-sequence
rendering at benchmark rates rather than an interactive window.
"""
from __future__ import annotations

import os
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
        if use_pallas:
            # Streamed v2 tier: same sorted candidate walk, cluster blocks
            # demand-fetched HBM -> VMEM ring buffer (kernels.stream) —
            # replaces the 10x-slower v1 work-list fallback for scenes
            # past the VMEM-resident budget.
            from tracer.kernels.stream import make_streamed_tracers

            return make_streamed_tracers(scene, accel)
        return make_accel_tracers(scene, accel, use_pallas=use_pallas)
    return make_brute_tracers(scene)


def _whitted_cfg(cfg: RenderConfig) -> WhittedConfig:
    return WhittedConfig(max_bounces=cfg.max_bounces, smooth_shading=cfg.smooth_shading)


# Test hook: route the tiled path through interpret-mode kernels off-TPU so
# the cap-sizing / ensure-exact / tiled-grad machinery is exercisable on the
# CPU test mesh (tests monkeypatch this; production leaves it False).
_FORCE_TILED_INTERPRET = False
# Same hook for the streamed (>VMEM scenes) tier.
_FORCE_STREAMED_INTERPRET = False


def _caps_cache_path() -> str:
    return os.environ.get(
        "TRACER_CAPS_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "tracer_caps.json"))


def _scene_cap_key(scene: Scene, camera: Camera, cfg: RenderConfig) -> str:
    """Cheap content hash for the sized-caps cache: shapes + sampled vertex
    bytes + camera + the cfg fields that shape the pipeline. A collision or
    a stale entry is SAFE — cached caps only seed the sizing loop, which
    still renders, checks overflow == 0, and widens if the scene outgrew
    them (caps are monotone; excess is always surfaced)."""
    import hashlib

    v = np.asarray(scene.verts)
    t = np.asarray(scene.tris)
    h = hashlib.sha1()
    h.update(str((v.shape, t.shape, cfg.height, cfg.width, cfg.max_bounces,
                  cfg.smooth_shading,
                  tuple(np.asarray(camera.position).tolist()))).encode())
    h.update(v[:: max(1, len(v) // 64)].tobytes())
    h.update(t[:: max(1, len(t) // 64)].tobytes())
    return h.hexdigest()


def _caps_cache_load(key: str):
    import json

    try:
        with open(_caps_cache_path()) as f:
            raw = json.load(f).get(key)
        if raw is None:
            return None
        if len(raw) == 3:  # streamed tier: (kc, ko, sc)
            return tuple(raw)
        to_t = lambda x: None if x is None else tuple(x)
        return (raw[0], raw[1], raw[2], to_t(raw[3]), to_t(raw[4]),
                to_t(raw[5]), to_t(raw[6]), to_t(raw[7]))
    except Exception:
        return None


def _caps_cache_store(key: str, caps) -> None:
    import json

    path = _caps_cache_path()
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        try:
            with open(path) as f:
                data = json.load(f)
        except Exception:
            data = {}
        data[key] = [list(c) if isinstance(c, tuple) else c for c in caps]
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(data, f)
        os.replace(tmp, path)
    except Exception:
        pass  # cache is an optimization only


def _tiled_interpret() -> bool:
    return _FORCE_TILED_INTERPRET and jax.default_backend() != "tpu"


def _use_tiled_path(scene: Scene, cfg: RenderConfig) -> bool:
    n_clusters = -(-scene.num_tris // 128)
    return (cfg.use_bvh and cfg.use_pallas
            and (jax.default_backend() == "tpu" or _FORCE_TILED_INTERPRET)
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
        from tracer.kernels.traversal2 import DEFAULT_K, ULTRA_K
        from tracer.bvh.cull import S_MID

        build = jax.jit(build_scene_accel)

        def build_run(caps):
            kc, k, s, split, sh_split, ultra, sh_ultra, s_u = caps

            @jax.jit
            def run_tiled(scene: Scene, accel, camera: Camera):
                return render_tiled(scene, accel, camera, cfg.height,
                                    cfg.width, wcfg, with_aux=True,
                                    k_closest=kc, k_cap=k, s_cap=s,
                                    closest_split=split,
                                    shadow_split=sh_split,
                                    closest_ultra=ultra,
                                    shadow_ultra=sh_ultra, s_ultra=s_u,
                                    interpret=_tiled_interpret())

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
                 "caps": (K_CLOSEST, DEFAULT_K, S_CAP, None, None, None,
                          None, None),
                 "run": None}

        def _size_caps(scene, accel, camera):
            n_cl = accel.num_clusters
            n_sc = accel.super_lo.shape[0]
            n_tiles = -(-cfg.height * cfg.width // 64)
            r8 = lambda v: max(8, -(-int(v) // 8) * 8)
            for it in range(8):
                if state["run"] is None:
                    state["run"] = build_run(state["caps"])
                img, aux = state["run"](scene, accel, camera)
                overflowed = int(aux["overflow"]) != 0
                kc, k, s, split, sh_split, ultra, sh_ultra, s_u = state["caps"]
                # First frame also measures the tile count distributions
                # for the closest three-tier partition (trace_tiles_split)
                # and the batch-graded any-hit (any_hit_tiles_graded); +8
                # slack keeps tiny count jitter from forcing a recompile.
                want_split = (min(r8(aux["need_split"]) + 8, n_tiles),
                              min(r8(aux["need_zero"]) + 8, n_tiles))
                want_sh = (min(r8(aux["need_sh_b1"]) + 8, n_tiles),
                           min(r8(aux["need_sh_zero"]) + 8, n_tiles))

                # Ultra tiers: when a few grazing tiles force the full word
                # width far past ULTRA_K, give only the measured heavy-tile
                # prefix that width and run the rest at ULTRA_K (monotone:
                # once on, the split only widens). ONLY for caps well past
                # ULTRA_K: a width-only split saves no dense work, so for
                # moderate caps (bench100k's shadow k=296, p99=29) the
                # extra region's launch+reassembly overhead LOSES — an
                # ULTRA_K2=32 mid tier measured 38.4 -> 48-52 ms on the
                # any-hit pass at every width tried (PERF_NOTES). The tier
                # pays only when it collapses hundreds of launches
                # (sponza: 1930-wide words, 490 -> ~65 launches).
                def want_ultra(cap, cur, need_key):
                    if cap <= 2 * ULTRA_K:
                        return cur
                    nu = min(r8(aux[need_key]) + 8, n_tiles)
                    if cur is not None:
                        nu = max(nu, cur[0])
                    return (nu, ULTRA_K)

                want_u = want_ultra(kc, ultra, "need_ultra")
                want_su = want_ultra(k, sh_ultra, "need_sh_ultra")
                # Cull s_ultra tier: when a few grazing tiles force the
                # supercluster cap far past S_MID, keep the stage-2 sort
                # narrow for the rest (bvh.cull s_ultra).
                if s <= 2 * S_MID:
                    want_s_u = s_u
                else:
                    nsu = min(r8(aux["need_s_mid"]) + 8, n_tiles)
                    if s_u is not None:
                        nsu = max(nsu, s_u[0])
                    want_s_u = (nsu, S_MID)
                if (not overflowed and split is not None
                        and sh_split is not None and ultra == want_u
                        and sh_ultra == want_su and s_u == want_s_u):
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

                new_caps = (kc, k, s, want_split, want_sh, want_u,
                            want_su, want_s_u)
                print(f"[tracer] sizing (overflow {int(aux['overflow'])}): "
                      f"caps {state['caps']} -> {new_caps}", file=sys.stderr)
                state["caps"] = new_caps
                state["run"] = build_run(state["caps"])
            # Non-convergence: fall back to the always-correct configuration
            # (full caps, everything in the generic tier) instead of raising
            # — slower, never wrong.
            import sys

            print(f"[tracer] sizing did not converge; falling back to full "
                  f"caps (was {state['caps']})", file=sys.stderr)
            state["caps"] = (n_cl, n_cl, n_sc, (n_tiles, n_tiles),
                             (n_tiles, n_tiles), None, None, None)
            state["run"] = build_run(state["caps"])

        def run(scene: Scene, camera: Camera, with_aux: bool = False,
                ensure_exact: bool = False):
            if state["scene"] is not scene:
                state["accel"] = build(scene)
                state["scene"] = scene
                # Reset to the defaults so a small scene after a large one
                # doesn't inherit oversized caps (compile/VMEM pressure) —
                # then seed from the persisted per-scene cache: a warm
                # entry makes the sizing pass converge on its first
                # iteration (and the one compile hits the XLA cache),
                # cutting cold CLI start from ~4-6 full-pipeline compiles
                # to one. Stale entries are safe: the loop still verifies
                # overflow == 0 and widens if the scene outgrew them.
                state["key"] = _scene_cap_key(scene, camera, cfg)
                cached = _caps_cache_load(state["key"])
                state["caps"] = cached if cached is not None else (
                    K_CLOSEST, DEFAULT_K, S_CAP, None, None, None, None,
                    None)
                state["run"] = None
                _size_caps(scene, state["accel"], camera)
                _caps_cache_store(state["key"], state["caps"])
            img, aux = state["run"](scene, state["accel"], camera)
            if ensure_exact and int(aux["overflow"]) != 0:
                # Camera moved past the sized caps (e.g. mid-animation):
                # re-size (monotone widening) for THIS camera and re-render.
                # Guarantees every returned frame is exact — used by
                # bin/trace --animate (VERDICT r4 missing #4). The widened
                # caps persist under the scene-load key, so the next
                # session's orbit pre-size finds them already wide.
                _size_caps(scene, state["accel"], camera)
                img, aux = state["run"](scene, state["accel"], camera)
                _caps_cache_store(state["key"], state["caps"])
            return (img, aux) if with_aux else img

        run.state = state  # sized caps readable by make_grad_step_fn
        return run

    if (cfg.use_bvh and cfg.use_pallas
            and (jax.default_backend() == "tpu"
                 or _FORCE_STREAMED_INTERPRET)
            and -(-scene.num_tris // 128) > _VMEM_RESIDENT_CLUSTERS):
        return _make_streamed_render_fn(scene, cfg, wcfg)

    trace_fn_builder = partial(build_tracers, cfg=cfg)

    @jax.jit
    def run_jit(scene: Scene, camera: Camera) -> jax.Array:
        trace_fn, occlude_fn = trace_fn_builder(scene)
        rays = generate_rays(camera, cfg.height, cfg.width)
        return render_wavefront(scene, rays, wcfg, trace_fn, occlude_fn)

    def run(scene: Scene, camera: Camera, with_aux: bool = False,
            ensure_exact: bool = False):
        # Non-tiled tracers have no caps: every frame is exact by
        # construction, so ensure_exact is a no-op and aux is trivial.
        img = run_jit(scene, camera)
        return (img, {"overflow": jnp.int32(0)}) if with_aux else img

    return run


def _make_streamed_render_fn(scene: Scene, cfg: RenderConfig, wcfg):
    """Render fn for >VMEM scenes on TPU: the HBM-streamed kernel tier
    (kernels.stream) through the aux wavefront integrator, with the same
    measure-escalate cap sizing, exactness guarantee (overflow surfaced
    and driven to zero for the sizing camera), persisted-caps seeding,
    and ensure_exact re-sizing contract as the tiled path."""
    from tracer.bvh import build_scene_accel
    from tracer.kernels.stream import make_streamed_tracers_aux
    from tracer.render.whitted import render_wavefront_aux

    build = jax.jit(build_scene_accel)
    DEFAULT_CAPS = (64, 64, 16)  # (k_trace, k_occ, s_cap)
    state = {"scene": None, "accel": None, "caps": DEFAULT_CAPS,
             "run": None}

    def build_run(caps):
        kc, ko, sc = caps

        interp = (_FORCE_STREAMED_INTERPRET
                  and jax.default_backend() != "tpu")

        @jax.jit
        def run_streamed(scene: Scene, accel, camera: Camera):
            trace_fn, occlude_fn = make_streamed_tracers_aux(
                scene, accel, k_cap=kc, s_cap=sc, k_occ=ko,
                interpret=interp)
            rays = generate_rays(camera, cfg.height, cfg.width)
            return render_wavefront_aux(scene, rays, wcfg, trace_fn,
                                        occlude_fn)

        return run_streamed

    # Memory-bounded cap ceilings: the cull's stage-2 intermediates scale
    # with Ntiles * s_cap * 16, so an unbounded s escalation can demand
    # tens of GB at COMPILE time (a 2-bounce 1080p frame on the 3.9M-tri
    # hall measured need_s ~ 1921: divergent bounce-ray tiles have fat
    # interval-hull frusta that touch nearly every supercluster). Past
    # these ceilings the sizing stops and the residual overflow stays
    # surfaced in aux (bench fails loudly) — the production answer for
    # such configs is ring-sharded geometry across chips (dist/ring.py),
    # not a single-chip frame. 1-bounce frames at pod-1m scale size to
    # exactness well inside the ceilings (PERF_NOTES streamed table).
    S_STREAM_MAX = 256
    K_STREAM_MAX = 2048

    def _size_caps(scene, accel, camera):
        import sys

        n_cl = accel.num_clusters
        n_sc = accel.super_lo.shape[0]
        r8 = lambda v: max(8, -(-int(v) // 8) * 8)
        for it in range(8):
            if state["run"] is None:
                state["run"] = build_run(state["caps"])
            img, aux = state["run"](scene, accel, camera)
            if int(aux["overflow"]) == 0:
                return
            kc, ko, sc = state["caps"]
            new = (min(max(r8(int(aux["need_trace_k"]) + 8), kc),
                       n_cl, K_STREAM_MAX),
                   min(max(r8(int(aux["need_occ_k"]) + 8), ko),
                       n_cl, K_STREAM_MAX),
                   min(max(int(aux["need_s"]) + 2, sc), n_sc, S_STREAM_MAX))
            if new == state["caps"]:
                print(f"[tracer] streamed sizing at memory ceiling with "
                      f"overflow {int(aux['overflow'])} (caps {new}): this "
                      f"config needs the ring-sharded tier for exactness",
                      file=sys.stderr)
                return
            print(f"[tracer] streamed sizing (overflow "
                  f"{int(aux['overflow'])}): caps {state['caps']} -> {new}",
                  file=sys.stderr)
            state["caps"] = new
            state["run"] = build_run(state["caps"])
        print("[tracer] streamed sizing stopped at iteration limit; "
              "overflow stays surfaced in aux", file=sys.stderr)

    def run(scene: Scene, camera: Camera, with_aux: bool = False,
            ensure_exact: bool = False):
        if state["scene"] is not scene:
            state["accel"] = build(scene)
            state["scene"] = scene
            state["key"] = "st-" + _scene_cap_key(scene, camera, cfg)
            cached = _caps_cache_load(state["key"])
            state["caps"] = cached if cached is not None else DEFAULT_CAPS
            state["run"] = None
            _size_caps(scene, state["accel"], camera)
            _caps_cache_store(state["key"], state["caps"])
        img, aux = state["run"](scene, state["accel"], camera)
        if ensure_exact and int(aux["overflow"]) != 0:
            _size_caps(scene, state["accel"], camera)
            img, aux = state["run"](scene, state["accel"], camera)
            _caps_cache_store(state["key"], state["caps"])
        return (img, aux) if with_aux else img

    run.state = state
    return run


def render(config: str | RenderConfig | None = None, **overrides) -> np.ndarray:
    """One-call render: resolve config -> scene -> jit -> (H, W, 3) float32."""
    cfg = config if isinstance(config, RenderConfig) else load_config(config, **overrides)
    scene, camera = get_scene(cfg)
    run = make_render_fn(scene, cfg)
    return np.asarray(run(scene, camera))


def _apply_grad_params(scene: Scene, camera: Camera, p: dict,
                       normal_fn=None):
    import dataclasses as dc

    from tracer.scene.types import compute_vertex_normals_jnp

    s = scene
    if "verts" in p:
        # Normals track the optimized vertices (differentiably) — see
        # diff.fit._apply_params. `normal_fn` is the precomputed-incidence
        # gather version (make_vertex_normal_fn) when the topology is
        # known concretely; the scatter fallback works for traced scenes.
        normals = (normal_fn(p["verts"]) if normal_fn is not None
                   else compute_vertex_normals_jnp(p["verts"], s.tris))
        s = dc.replace(s, verts=p["verts"], normals=normals)
    if "albedo" in p:
        s = dc.replace(s, materials=dc.replace(s.materials, albedo=p["albedo"]))
    cam = camera
    if "cam_pos" in p:
        cam = dc.replace(cam, position=p["cam_pos"])
    return s, cam


def sized_tiled_caps(scene: Scene, camera: Camera, cfg: RenderConfig,
                     slack: int = 16):
    """Cap-size the tiled path for (scene, camera) via one forward render
    and return (kc, k, s, closest_split, shadow_split, closest_ultra,
    shadow_ultra) widened by `slack` so small parameter motion during
    optimization can't overflow (overflow stays surfaced in aux either
    way)."""
    run = make_render_fn(scene, cfg)
    run(scene, camera)
    kc, k, s, split, sh_split, ultra, sh_ultra, s_u = run.state["caps"]
    accel = run.state["accel"]
    n_cl = accel.num_clusters
    n_sc = accel.super_lo.shape[0]
    n_tiles = -(-cfg.height * cfg.width // 64)
    r8 = lambda v: max(8, -(-int(v) // 8) * 8)
    widen = lambda sp: (min(r8(sp[0] + 8 * slack), n_tiles),
                       min(r8(sp[1] + 8 * slack), n_tiles))
    widen_u = lambda u: u if u is None else (min(r8(u[0] + 8 * slack),
                                                n_tiles), u[1])
    return (min(r8(kc + slack), n_cl), min(r8(k + slack), n_cl),
            min(s + 2, n_sc), widen(split), widen(sh_split),
            widen_u(ultra), widen_u(sh_ultra), widen_u(s_u))


def make_grad_step_fn(cfg: RenderConfig, optimizer, scene: Scene = None,
                      camera: Camera = None, tiled: str = "auto"):
    """Jitted (scene, camera, target, params, opt_state) ->
    (loss, params, opt_state, aux) optimization step of the image MSE
    w.r.t. scene params. aux["overflow"] counts cull candidates dropped
    because the parameters outgrew the sized caps: 0 means exact
    gradients (the jnp tiers are structurally 0); callers should warn or
    re-size on nonzero. `params` selects what is optimized: dict with optional
    keys 'verts', 'albedo', 'cam_pos'. Used by the inverse-rendering loop
    (tracer.diff.fit, BASELINE config 3).

    tiled: "auto" differentiates through the TPU kernel tier
    (render.tiled: Pallas selection kernels + differentiable shade-row
    recompute) when `_use_tiled_path` holds AND (scene, camera) are
    provided for the cap-sizing forward pass — an order of magnitude
    faster than the jnp scan tier at spec scale (VERDICT r4 missing #3).
    "interpret" forces the tiled path with interpret-mode kernels (CPU
    tests); "off" always uses the wavefront tracers."""
    import optax

    wcfg = _whitted_cfg(cfg)

    use_tiled = (tiled == "interpret"
                 or (tiled == "auto" and scene is not None
                     and camera is not None and _use_tiled_path(scene, cfg)))
    if use_tiled:
        from tracer.bvh import build_scene_accel
        from tracer.render.tiled import render_tiled

        interpret = tiled == "interpret" or _tiled_interpret()
        normal_fn = None
        if scene is not None:
            from tracer.scene.types import make_vertex_normal_fn

            normal_fn = make_vertex_normal_fn(np.asarray(scene.tris),
                                              scene.verts.shape[0])
        if tiled == "interpret":
            # Always-correct caps: render_tiled/cull clamp k to the
            # cluster count and s to the supercluster count, so huge
            # requests mean NO truncation anywhere (the splits' None
            # default is the all-generic tier). The r5 review caught the
            # previous None-caps defaults silently truncating (S_CAP=16).
            caps = (1 << 20, 1 << 20, 1 << 20, None, None, None, None,
                    None)
        else:
            caps = sized_tiled_caps(scene, camera, cfg)

        @jax.jit
        def step_tiled(scene: Scene, camera: Camera, target: jax.Array,
                       params, opt_state):
            def loss_fn(p):
                s, cam = _apply_grad_params(scene, camera, p,
                                            normal_fn=normal_fn)
                # Accel built INSIDE the loss: cluster assignment and the
                # kernels are stop-gradiented (piecewise constant), but the
                # shade rows (v0/e1/e2/normals/albedo) are differentiable
                # functions of the current params, so grads flow through
                # the row recompute (render/tiled.py docstring).
                accel = build_scene_accel(s)
                kw = dict(
                    k_closest=caps[0], k_cap=caps[1], s_cap=caps[2],
                    closest_split=caps[3], shadow_split=caps[4],
                    closest_ultra=caps[5], shadow_ultra=caps[6],
                    s_ultra=caps[7])
                img, aux = render_tiled(s, accel, cam, cfg.height,
                                        cfg.width, wcfg,
                                        interpret=interpret,
                                        with_aux=True, **kw)
                return jnp.mean((img - target) ** 2), aux["overflow"]

            (loss, overflow), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, new_opt_state = optimizer.update(grads, opt_state, params)
            # Surfaced truncation (r5 review): parameters that outgrow the
            # sized caps' slack must not silently corrupt gradients. The
            # overflow rides the step OUTPUT (4th slot) — in-jit
            # jax.debug.print is a host callback some PJRT transports
            # (the remote-TPU tunnel) reject outright.
            return (loss, optax.apply_updates(params, updates),
                    new_opt_state, {"overflow": overflow})

        return step_tiled

    # Non-tiled fallback: the jnp tiers only. The v1/v2/streamed Pallas
    # tracers cannot be differentiated through (pallas_call has no JVP/VJP
    # rule and render_wavefront does not stop-gradient its tracers the way
    # render_tiled does), so a use_pallas config on TPU must drop to the
    # jnp cluster tier here — same algorithm, XLA-compiled, differentiable.
    cfg_nd = cfg.replace(use_pallas=False) if cfg.use_pallas else cfg

    @jax.jit
    def step(scene: Scene, camera: Camera, target: jax.Array, params, opt_state):
        def loss_fn(p):
            s, cam = _apply_grad_params(scene, camera, p)
            trace_fn, occlude_fn = build_tracers(s, cfg_nd)
            rays = generate_rays(cam, cfg.height, cfg.width)
            img = render_wavefront(s, rays, wcfg, trace_fn, occlude_fn)
            return jnp.mean((img - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        # Same 4-output contract as the tiled step; the jnp tiers cannot
        # truncate, so overflow is structurally 0.
        return loss, new_params, new_opt_state, {"overflow": jnp.int32(0)}

    return step


# Compiled-step cache for the grad_step convenience wrapper: without it a
# Python loop over grad_step would rebuild a fresh @jax.jit closure (and
# recompile the full render+backward graph) every iteration. Keyed on the
# frozen config + optimizer identity (optax transforms are NamedTuples of
# functions — hashable). Bounded: each entry pins a compiled
# render+backward executable, so passing a fresh optax instance per call
# must recycle the oldest entry rather than leak compiles. Loops should
# still prefer make_grad_step_fn.
_GRAD_STEP_CACHE: dict = {}
_GRAD_STEP_CACHE_MAX = 4
_GRAD_STEP_CALLS = 0
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
        while len(_GRAD_STEP_CACHE) >= _GRAD_STEP_CACHE_MAX:
            _GRAD_STEP_CACHE.pop(next(iter(_GRAD_STEP_CACHE)))
        step = _GRAD_STEP_CACHE[key] = make_grad_step_fn(cfg, optimizer)
    loss, new_params, new_opt_state, aux = step(scene, camera, target,
                                                params, opt_state)
    # Overflow check: reading the scalar forces a device sync, which would
    # serialize a tight loop over this wrapper — check the first and then
    # every 16th call (loops should prefer make_grad_step_fn and read the
    # step's aux themselves).
    global _GRAD_STEP_CALLS
    _GRAD_STEP_CALLS += 1
    if _GRAD_STEP_CALLS % 16 in (1,) and int(aux["overflow"]) != 0:
        import sys

        print(f"[tracer] WARNING: grad step dropped {int(aux['overflow'])} "
              f"cull candidates — params outgrew the sized caps",
              file=sys.stderr)
    return loss, new_params, new_opt_state


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
    # Every render-fn variant supports with_aux (tiled and streamed report
    # real cull overflow; the exact-by-construction tiers report 0).
    _, aux = run(scene, camera, with_aux=True)
    overflow = int(aux["overflow"]) if "overflow" in aux else None
    live_rays = int(aux["live_rays"]) if "live_rays" in aux else None
    primary_rays = cfg.height * cfg.width
    # Count every traced wavefront: per bounce one closest-hit pass plus one
    # shadow pass per light (the standard rays/s accounting for Whitted).
    # `primary_rays_per_s` is the stricter closest-hit-only number;
    # `live_rays_per_s` counts only rays actually traced (dead d == 0
    # wavefront slots excluded — the honest multi-bounce number).
    rays_per_frame = primary_rays * cfg.max_bounces * (1 + scene.lights.count)
    return {
        "config": cfg,
        "ms_per_frame": dt * 1e3,
        "fps": 1.0 / dt,
        "rays_per_s": rays_per_frame / dt,
        "primary_rays_per_s": primary_rays * cfg.max_bounces / dt,
        "live_rays_per_s": None if live_rays is None else live_rays / dt,
        "num_tris": scene.num_tris,
        "overflow": overflow,
        "image": np.asarray(img),
    }


def benchmark_grad_step(config: str | RenderConfig | None = "bunny-grad",
                        iters: int = 5, warmup: int = 1,
                        params: tuple = ("verts",), tiled: str = "auto",
                        **overrides) -> dict:
    """Timed optimization steps (loss+grad+update) -> grad_step_ms.

    BASELINE.md requires grad-step time measured and reported per config.
    `params` selects the optimized leaves: any of "verts", "albedo",
    "cam_pos" (BASELINE config 3 optimizes all three families).
    `tiled="auto"` uses the TPU kernel tier when the config supports it
    (see make_grad_step_fn); `"off"` forces the jnp tier.
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
    step = make_grad_step_fn(cfg, optimizer, scene=scene, camera=camera,
                             tiled=tiled)
    aux = None
    for _ in range(max(warmup, 1)):
        loss, params, opt_state, aux = step(scene, camera, target, params,
                                            opt_state)
        jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        loss, params, opt_state, aux = step(scene, camera, target, params,
                                            opt_state)
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / iters
    return {"grad_step_ms": dt * 1e3, "loss": float(loss),
            "overflow": int(aux["overflow"]), "config": cfg}
