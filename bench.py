#!/usr/bin/env python3
"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline metric (BASELINE.md): rays/s/chip on a ~100k-tri BVH scene at 1080p.
vs_baseline is measured against the 100M rays/s/chip target.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_RAYS_PER_S = 100e6  # >=100M rays/s/chip target (BASELINE.json:5)


def main() -> int:
    # Headline config: ~100k-tri scene at 1080p, best available backend.
    from tracer.api import benchmark

    preset = os.environ.get("BENCH_PRESET", "bench100k")
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    result = benchmark(preset, iters=iters)
    out = {
        "metric": "rays_per_s_per_chip_100ktri_1080p",
        "value": round(result["rays_per_s"], 1),
        "unit": "rays/s",
        "vs_baseline": round(result["rays_per_s"] / BASELINE_RAYS_PER_S, 4),
        "detail": {
            "ms_per_frame": round(result["ms_per_frame"], 3),
            "num_tris": int(result["num_tris"]),
            "preset": preset,
        },
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
