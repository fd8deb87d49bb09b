"""Config system: frozen dataclasses, JSON-loadable, CLI-overridable.

Reference parity: the reference hardcodes constants / argv (SURVEY.md §5).
Here every BASELINE config ships as a named preset (SURVEY.md T15).
"""
from __future__ import annotations

import dataclasses
import json
from typing import Any


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """One fully-specified render/benchmark configuration."""

    scene: str = "cornell"          # cornell | bunny | hall | soup | obj:<path>
    height: int = 256
    width: int = 256
    max_bounces: int = 1
    smooth_shading: bool = True
    use_bvh: bool = False           # brute force vs LBVH+kernels
    use_pallas: bool = False        # jnp traversal vs Pallas kernel
    scene_arg: int = 0              # scene-specific size knob (e.g. subdiv)
    dtype: str = "float32"
    profile: bool = False

    def replace(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class DistConfig:
    """Distribution configuration (SURVEY.md T9-T13)."""

    data_axis: int = 1              # chips used for tile/ray data parallelism
    geom_axis: int = 1              # chips the geometry is sharded over (ring)
    multihost: bool = False
    coordinator: str = ""
    num_processes: int = 1
    process_id: int = 0


# Named presets per BASELINE.json configs 1-5.
PRESETS: dict[str, RenderConfig] = {
    "cornell256": RenderConfig(scene="cornell", height=256, width=256, max_bounces=1,
                               smooth_shading=False, use_bvh=False),
    "bunny512": RenderConfig(scene="bunny", height=512, width=512, max_bounces=1,
                             scene_arg=6, use_bvh=True, use_pallas=True),
    "bunny-grad": RenderConfig(scene="bunny", height=128, width=128, max_bounces=1,
                               scene_arg=3, use_bvh=True),
    "sponza1080": RenderConfig(scene="hall", height=1080, width=1920, max_bounces=3,
                               use_bvh=True, use_pallas=True),
    "pod-1m": RenderConfig(scene="hall", height=1080, width=1920, max_bounces=2,
                           scene_arg=1, use_bvh=True, use_pallas=True),
    # Headline bench config (BASELINE.md): ~100k-tri scene at 1080p.
    "bench100k": RenderConfig(scene="bench", height=1080, width=1920, max_bounces=1,
                              use_bvh=True, use_pallas=True),
}


def load_config(source: str | dict | None = None, **overrides: Any) -> RenderConfig:
    """Resolve a config from a preset name, JSON path, or dict + overrides."""
    if source is None:
        cfg = RenderConfig()
    elif isinstance(source, dict):
        cfg = RenderConfig(**source)
    elif source in PRESETS:
        cfg = PRESETS[source]
    elif source.endswith(".json"):
        with open(source) as f:
            cfg = RenderConfig(**json.load(f))
    else:
        raise ValueError(f"unknown config '{source}' (presets: {sorted(PRESETS)})")
    return cfg.replace(**overrides) if overrides else cfg
