#!/usr/bin/env python3
"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline metric (BASELINE.md): rays/s/chip on a ~100k-tri BVH scene at 1080p.
vs_baseline is measured against the 100M rays/s/chip target. The detail dict
carries the honest accounting breakdown (BASELINE.md grad-step row; VERDICT
r2 items 2/8/9):
  - rays/frame = H*W * bounces * (1 + lights): every traced wavefront
    (closest-hit + one shadow pass per light) — primary_rays_per_s is the
    stricter closest-hit-only number;
  - overflow: cull candidates dropped by the k-caps (0 == exact geometry);
  - grad_step_ms: one full optimization step on the bunny-grad preset.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Persistent XLA compile cache: first-compile of the 1080p pipeline over the
# remote-chip tunnel is minutes; cached reruns are seconds.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

BASELINE_RAYS_PER_S = 100e6  # >=100M rays/s/chip target (BASELINE.json:5)


def scaling_rows() -> int:
    """--scaling: emit BASELINE.md scaling-table rows.

    With >1 visible device this MEASURES the sharded accel render
    (dist.scaling.scaling_sweep) over submeshes of 1, 2, ..., N devices
    and prints efficiency per row — on pod hardware this is the BASELINE
    table; on a forced CPU mesh the rows are labeled cpu-mesh (the harness
    is proven, the timings aren't hardware). With exactly one device the
    single-chip row is measured and multi-chip rows stay pending."""
    import jax

    from tracer.utils.config import load_config

    preset = os.environ.get("BENCH_PRESET", "bench100k")
    iters = int(os.environ.get("BENCH_ITERS", "5"))
    devs = jax.devices()
    n = len(devs)
    kind = devs[0].device_kind
    print("| Topology | rays/s | scaling efficiency | status |")
    print("|---|---|---|---|")
    if n > 1:
        from tracer.dist.scaling import scaling_sweep

        status = ("measured" if jax.default_backend() == "tpu"
                  else "cpu-mesh (harness proof; timings not hardware)")
        rows = scaling_sweep(load_config(preset), iters=iters)
        for r in rows:
            print(f"| {r['devices']}x {kind} | "
                  f"{r['rays_per_s'] / 1e6:.1f} Mrays/s | "
                  f"{r['efficiency'] * 100:.1f}% | {status} |")
        return 0

    from tracer.api import benchmark

    result = benchmark(preset, iters=iters)
    mray = result["rays_per_s"] / 1e6
    print(f"| 1 chip ({kind}) | {mray:.1f} Mrays/s "
          f"| 100% (definition) | measured |")
    for label in ("1 host (4 chips)", "4 hosts (16 chips)"):
        print(f"| {label} | — | target >=85% | pending pod hardware "
              f"(this env exposes {n} chip) |")
    return 0


def main() -> int:
    if "--scaling" in sys.argv:
        return scaling_rows()

    from tracer.api import benchmark, benchmark_grad_step

    preset = os.environ.get("BENCH_PRESET", "bench100k")
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    result = benchmark(preset, iters=iters)
    if result["overflow"] is not None and result["overflow"] != 0:
        # A throughput number on truncated geometry is not a result
        # (VERDICT r3 weak #2): the cap auto-sizing should make this
        # impossible for the static bench camera — treat it as a failure.
        print(json.dumps({"error": "bench frame dropped cull candidates",
                          "overflow": int(result["overflow"])}))
        return 1
    detail = {
        "ms_per_frame": round(result["ms_per_frame"], 3),
        "num_tris": int(result["num_tris"]),
        "preset": preset,
        "primary_rays_per_s": round(result["primary_rays_per_s"], 1),
        "overflow": result["overflow"],
    }
    if result.get("live_rays_per_s") is not None:
        # Rays actually traced (dead wavefront slots excluded) — the honest
        # multi-bounce accounting (VERDICT r4 weak #5).
        detail["live_rays_per_s"] = round(result["live_rays_per_s"], 1)
    if os.environ.get("BENCH_GRAD", "1") != "0":
        try:
            g = benchmark_grad_step("bunny-grad", iters=3)
            detail["grad_step_ms"] = round(g["grad_step_ms"], 3)
            detail["grad_preset"] = "bunny-grad"
        except Exception as e:  # pragma: no cover - report, don't fail bench
            detail["grad_step_error"] = str(e)[:200]
        try:
            # Spec-scale grad step (BASELINE config 3 at bunny512 size, all
            # three parameter families) on the TPU kernel tier: Pallas
            # selection kernels + differentiable shade-row recompute
            # (make_grad_step_fn tiled="auto"; VERDICT r4 missing #3).
            g5 = benchmark_grad_step("bunny512", iters=3, warmup=1,
                                     params=("verts", "albedo", "cam_pos"))
            detail["grad_step_bunny512_ms"] = round(g5["grad_step_ms"], 3)
            # Gradients on truncated geometry are not a result either.
            detail["grad_step_bunny512_overflow"] = g5.get("overflow")
        except Exception as e:  # pragma: no cover
            detail["grad_step_512_error"] = str(e)[:200]
        try:
            # The jnp scan tier at the same scale, for comparison (this was
            # the only spec-scale grad number before r5).
            g5j = benchmark_grad_step("bunny512", iters=1, warmup=1,
                                      use_pallas=False, tiled="off",
                                      params=("verts", "albedo", "cam_pos"))
            detail["grad_step_bunny512_jnp_ms"] = round(g5j["grad_step_ms"], 3)
        except Exception as e:  # pragma: no cover
            detail["grad_step_512_jnp_error"] = str(e)[:200]
    out = {
        "metric": "rays_per_s_per_chip_100ktri_1080p",
        "value": round(result["rays_per_s"], 1),
        "unit": "rays/s",
        "vs_baseline": round(result["rays_per_s"] / BASELINE_RAYS_PER_S, 4),
        "detail": detail,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
