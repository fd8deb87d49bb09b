from tracer.utils.image import write_png, read_png, tonemap
from tracer.utils.config import RenderConfig, DistConfig, PRESETS, load_config

__all__ = [
    "write_png", "read_png", "tonemap",
    "RenderConfig", "DistConfig", "PRESETS", "load_config",
]
