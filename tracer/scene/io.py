"""Wavefront OBJ loading (host-side, numpy).

Reference parity: the OpenCL reference loads mesh files at startup into
triangle arrays (SURVEY.md R7). We support the OBJ subset that matters for
triangle scenes: v / vn / f (with v, v//vn, v/vt/vn forms), negative indices,
`usemtl` material switching, and a minimal .mtl parser (Kd diffuse, Ke
emission, Ks-as-mirror heuristic). Polygons are fan-triangulated.
"""
from __future__ import annotations

import os

import numpy as np

from tracer.scene.types import Scene, Materials, Lights


def _parse_mtl(path: str) -> dict[str, dict]:
    mats: dict[str, dict] = {}
    cur = None
    if not os.path.exists(path):
        return mats
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts or parts[0].startswith("#"):
                continue
            if parts[0] == "newmtl":
                cur = parts[1]
                mats[cur] = {"Kd": (0.7, 0.7, 0.7), "Ke": (0.0, 0.0, 0.0), "Ks": (0.0, 0.0, 0.0)}
            elif cur and parts[0] in ("Kd", "Ke", "Ks"):
                mats[cur][parts[0]] = tuple(float(x) for x in parts[1:4])
    return mats


def _parse_obj_python(path: str):
    """Pure-Python OBJ parse — the definition of record and the fallback
    for the native tier. Returns (verts, tris, mat_of_tri, mat_names,
    mtl_lib)."""
    verts: list = []
    tris: list = []
    mat_of_tri: list = []
    mtl_lib: dict[str, dict] = {}
    mat_names: list[str] = ["default"]
    mat_index = {"default": 0}
    cur_mat = 0

    def vidx(tok: str, n: int) -> int:
        i = int(tok.split("/")[0])
        return i - 1 if i > 0 else n + i

    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts or parts[0].startswith("#"):
                continue
            tag = parts[0]
            if tag == "v":
                verts.append([float(parts[1]), float(parts[2]), float(parts[3])])
            elif tag == "mtllib":
                # OBJ allows several library files per mtllib line.
                for lib in parts[1:]:
                    mtl_lib.update(
                        _parse_mtl(os.path.join(os.path.dirname(path), lib)))
            elif tag == "usemtl":
                name = parts[1]
                if name not in mat_index:
                    mat_index[name] = len(mat_names)
                    mat_names.append(name)
                cur_mat = mat_index[name]
            elif tag == "f":
                n = len(verts)
                idx = [vidx(t, n) for t in parts[1:]]
                for k in range(1, len(idx) - 1):  # fan triangulation
                    tris.append([idx[0], idx[k], idx[k + 1]])
                    mat_of_tri.append(cur_mat)
    return (np.asarray(verts, np.float32).reshape(-1, 3),
            np.asarray(tris, np.int32).reshape(-1, 3),
            np.asarray(mat_of_tri, np.int32), mat_names, mtl_lib)


def load_obj(path: str, default_light: bool = True,
             native: bool | str = "auto") -> Scene:
    """Parse an OBJ file into a Scene.

    Vertex normals from the file are used when present and fully specified;
    otherwise area-weighted normals are computed.

    native: "auto" uses the C++ parser (cpp/objloader.cpp via ctypes —
    the reference's scene loader is C++, SURVEY.md R7) when it builds,
    falling back to the Python parser; True requires it; False skips it.
    Both produce identical Scenes (tests/unit/test_scene_io.py).
    """
    parsed = None
    if native in ("auto", True):
        try:
            from tracer.scene.cpp_loader import parse_obj_native

            verts_np, tris_np, mat_np, names, libs = parse_obj_native(path)
            mtl_lib: dict[str, dict] = {}
            for lb in libs:
                mtl_lib.update(
                    _parse_mtl(os.path.join(os.path.dirname(path), lb)))
            parsed = (verts_np, tris_np, mat_np, names, mtl_lib)
        except Exception:
            if native is True:
                raise
    if parsed is None:
        parsed = _parse_obj_python(path)
    verts_np, tris_np, mat_of_tri, mat_names, mtl_lib = parsed
    albedo, emission, mirror = [], [], []
    for name in mat_names:
        m = mtl_lib.get(name, {"Kd": (0.7, 0.7, 0.7), "Ke": (0, 0, 0), "Ks": (0, 0, 0)})
        albedo.append(m["Kd"])
        emission.append(m["Ke"])
        mirror.append(float(np.mean(m["Ks"])))
    materials = Materials.make(albedo=np.asarray(albedo, np.float32),
                               emission=np.asarray(emission, np.float32),
                               mirror=np.asarray(mirror, np.float32))
    if default_light:
        lo, hi = verts_np.min(0), verts_np.max(0)
        center, diag = (lo + hi) / 2, float(np.linalg.norm(hi - lo))
        lights = Lights(
            position=np.asarray([center + np.array([0.3, 0.45, 0.25]) * diag], np.float32),
            intensity=np.full((1, 3), diag * diag, np.float32),
        )
    else:
        lights = Lights(position=np.zeros((0, 3), np.float32), intensity=np.zeros((0, 3), np.float32))
    return Scene.make(verts_np, tris_np, np.asarray(mat_of_tri, np.int32), materials, lights)


def save_obj(path: str, verts: np.ndarray, tris: np.ndarray) -> None:
    """Minimal OBJ writer (round-trip tests, exporting optimized geometry)."""
    with open(path, "w") as f:
        for v in np.asarray(verts):
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for t in np.asarray(tris):
            f.write(f"f {t[0]+1} {t[1]+1} {t[2]+1}\n")
