"""ctypes loader/builder for the native OBJ parser (cpp/objloader.cpp).

Same pattern as tracer/refcpu/cpp.py (the C++ oracle): pybind11 is not in
this environment, so the parser is a plain C-ABI shared library built on
demand with g++ and called through ctypes. The pure-Python parser in
tracer/scene/io.py stays the definition of record and the fallback —
`parse_obj_native` raises LoaderUnavailable on any build/load problem and
callers fall through.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "cpp", "objloader.cpp")
_LIB = os.path.join(_REPO, "cpp", "libobjloader.so")

_lib = None
_build_error: str | None = None


class LoaderUnavailable(RuntimeError):
    pass


def _build() -> None:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-o", _LIB, _SRC]
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    if proc.returncode != 0:
        raise LoaderUnavailable(
            f"g++ build failed (rc={proc.returncode}):\n{proc.stderr[-2000:]}")


def _load() -> ctypes.CDLL:
    global _lib, _build_error
    if _lib is not None:
        return _lib
    if _build_error is not None:
        raise LoaderUnavailable(_build_error)
    try:
        if not os.path.exists(_SRC):
            raise LoaderUnavailable(f"missing {_SRC}")
        # Built with -march=native: never ship the .so, rebuild on demand
        # (stale or foreign binaries are rebuilt once, then retried).
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            _build()
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _build()
            lib = ctypes.CDLL(_LIB)
    except LoaderUnavailable as e:
        _build_error = str(e)
        raise
    except Exception as e:  # timeout, OSError from the retry dlopen, ...
        _build_error = f"{type(e).__name__}: {e}"
        raise LoaderUnavailable(_build_error) from e
    i64 = ctypes.c_int64
    lib.obj_parse.restype = i64
    lib.obj_parse.argtypes = [ctypes.c_char_p]
    lib.obj_counts.restype = None
    lib.obj_counts.argtypes = [i64] + [ctypes.POINTER(i64)] * 4
    lib.obj_copy.restype = None
    lib.obj_copy.argtypes = [
        i64,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ctypes.c_char_p, ctypes.c_char_p,
    ]
    lib.obj_free.restype = None
    lib.obj_free.argtypes = [i64]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except LoaderUnavailable:
        return False


def parse_obj_native(path: str):
    """Parse `path` with the C++ parser.

    Returns (verts (Nv,3) f32, tris (Nt,3) i32, mat_of_tri (Nt,) i32,
    mat_names list[str] in index order, mtllib_paths list[str]).
    """
    lib = _load()
    h = lib.obj_parse(os.fsencode(path))
    if h < 0:
        raise LoaderUnavailable(f"obj_parse failed for {path}")
    try:
        nv = ctypes.c_int64()
        nt = ctypes.c_int64()
        nl = ctypes.c_int64()
        ll = ctypes.c_int64()
        lib.obj_counts(h, ctypes.byref(nv), ctypes.byref(nt),
                       ctypes.byref(nl), ctypes.byref(ll))
        verts = np.empty((nv.value, 3), np.float32)
        tris = np.empty((nt.value, 3), np.int32)
        mat = np.empty((nt.value,), np.int32)
        names_buf = ctypes.create_string_buffer(max(nl.value, 1))
        libs_buf = ctypes.create_string_buffer(max(ll.value, 1))
        lib.obj_copy(h, verts, tris, mat, names_buf, libs_buf)
        names = (names_buf.raw[:nl.value].decode() if nl.value else "")
        libs = (libs_buf.raw[:ll.value].decode() if ll.value else "")
        return (verts, tris, mat,
                names.split("\n") if names else [],
                libs.split("\n") if libs else [])
    finally:
        lib.obj_free(h)
