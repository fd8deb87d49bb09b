from tracer.scene.types import Scene, Materials, Lights, compute_vertex_normals, merge_meshes
from tracer.scene.procedural import cornell_box, bunny_scene, columned_hall, random_tri_soup
from tracer.scene.io import load_obj, save_obj

__all__ = [
    "Scene", "Materials", "Lights", "compute_vertex_normals", "merge_meshes",
    "cornell_box", "bunny_scene", "columned_hall", "random_tri_soup",
    "load_obj", "save_obj",
]
