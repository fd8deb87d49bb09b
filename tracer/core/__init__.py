from tracer.core.types import Ray, Hit, NO_HIT
from tracer.core.camera import Camera, generate_rays
from tracer.core.intersect import (
    moller_trumbore,
    triangle_affine_maps,
    intersect_packed,
    intersect_brute,
)

__all__ = [
    "Ray",
    "Hit",
    "NO_HIT",
    "Camera",
    "generate_rays",
    "moller_trumbore",
    "triangle_affine_maps",
    "intersect_packed",
    "intersect_brute",
]
