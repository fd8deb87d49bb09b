"""ctypes loader/builder for the C++ CPU oracle (cpp/oracle.cpp, T8).

pybind11 is not available in this environment, so the oracle is a plain
C-ABI shared library built on demand with g++ and called through ctypes
(SURVEY.md T8; numpy fallback in tracer/refcpu/oracle.py stays the
definition of record). Build failures degrade gracefully: callers check
`available()` / catch OracleUnavailable and fall back to numpy.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "cpp", "oracle.cpp")
_LIB = os.path.join(_REPO, "cpp", "liboracle.so")

_lib = None
_build_error: str | None = None


class OracleUnavailable(RuntimeError):
    pass


def _build() -> None:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-o", _LIB, _SRC]
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    if proc.returncode != 0:
        raise OracleUnavailable(
            f"g++ build failed (rc={proc.returncode}):\n{proc.stderr[-2000:]}")


def _load() -> ctypes.CDLL:
    global _lib, _build_error
    if _lib is not None:
        return _lib
    if _build_error is not None:
        raise OracleUnavailable(_build_error)
    try:
        if not os.path.exists(_SRC):
            raise OracleUnavailable(f"missing {_SRC}")
        # The .so is NOT committed (built with -march=native, so a binary
        # from another machine could SIGILL at call time); it is built on
        # demand and rebuilt whenever the source is newer or dlopen fails.
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            _build()
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _build()  # stale/foreign binary: rebuild once, then retry
            lib = ctypes.CDLL(_LIB)
    except OracleUnavailable as e:
        _build_error = str(e)
        raise
    except OSError as e:  # dlopen failure after rebuild
        _build_error = str(e)
        raise OracleUnavailable(str(e))

    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.oracle_render.restype = ctypes.c_int
    lib.oracle_render.argtypes = [
        f32p, ctypes.c_int,          # verts, n_verts
        i32p, ctypes.c_int,          # tris, n_tris
        i32p,                        # mat_id
        f32p, f32p, f32p,            # albedo, emission, mirror
        f32p, f32p,                  # specular, shininess (Phong)
        f32p,                        # normals
        f32p, f32p, ctypes.c_int,    # light_pos, light_int, n_lights
        f32p,                        # cam[10]
        ctypes.c_int, ctypes.c_int,  # height, width
        ctypes.c_int, ctypes.c_int,  # max_bounces, smooth
        f32p, ctypes.c_float,        # sky, ambient
        f32p,                        # out
    ]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except OracleUnavailable:
        return False


def cpp_render(scene, camera, height: int, width: int, max_bounces: int = 1,
               smooth_shading: bool = True, sky_color=(0.0, 0.0, 0.0),
               ambient: float = 0.04) -> np.ndarray:
    """Drop-in fast replacement for refcpu.oracle.cpu_render."""
    lib = _load()
    c = lambda a, dt: np.ascontiguousarray(np.asarray(a), dtype=dt)
    verts = c(scene.verts, np.float32)
    tris = c(scene.tris, np.int32)
    cam = np.concatenate([
        c(camera.position, np.float32), c(camera.look_at, np.float32),
        c(camera.up, np.float32),
        np.asarray([float(camera.fov_y)], np.float32)])
    out = np.empty((height, width, 3), np.float32)
    rc = lib.oracle_render(
        verts, verts.shape[0], tris, tris.shape[0],
        c(scene.mat_id, np.int32),
        c(scene.materials.albedo, np.float32),
        c(scene.materials.emission, np.float32),
        c(scene.materials.mirror, np.float32),
        c(scene.materials.specular, np.float32),
        c(scene.materials.shininess, np.float32),
        c(scene.normals, np.float32),
        c(scene.lights.position, np.float32),
        c(scene.lights.intensity, np.float32),
        scene.lights.count,
        c(cam, np.float32), height, width, max_bounces,
        1 if smooth_shading else 0,
        c(sky_color, np.float32), float(ambient), out)
    if rc != 0:
        raise OracleUnavailable(f"oracle_render returned {rc}")
    return out
