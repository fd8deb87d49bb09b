from tracer.render.whitted import (
    WhittedConfig,
    render_image,
    render_wavefront,
    make_brute_tracers,
    shading_frame,
    direct_lighting,
)

__all__ = [
    "WhittedConfig",
    "render_image",
    "render_wavefront",
    "make_brute_tracers",
    "shading_frame",
    "direct_lighting",
]
