"""ctypes bindings + on-demand build of the native runtime (C++).

The reference's runtime around the GPU compute is C++ (threads, OpenCV IO,
mutex-guarded graph state); the TPU framework keeps the same split: JAX/XLA
for device compute, this C++ layer for host IO and ragged graph queries.
Built once with g++ into the package directory; pure-Python fallbacks keep
everything functional if the toolchain is missing.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import List, Optional, Sequence

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "native")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None

_SRCS = ["dataloader.cpp", "covis_graph.cpp"]


def _so_path() -> str:
    """Content-addressed output path: the library is always (re)built from the
    committed sources — a stale or foreign binary can never be picked up,
    because the filename encodes the hash of exactly what it was built from.
    No binaries are committed to the repo (build/ is gitignored)."""
    h = hashlib.sha256()
    for f in _SRCS:
        with open(os.path.join(_SRC, f), "rb") as fh:
            h.update(fh.read())
    return os.path.join(_DIR, "build",
                        f"libglslam_runtime-{h.hexdigest()[:16]}.so")


def _build(so: str) -> bool:
    srcs = [os.path.join(_SRC, f) for f in _SRCS]
    os.makedirs(os.path.dirname(so), exist_ok=True)
    tmp = so + f".tmp{os.getpid()}"
    cmd = ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-pthread",
           *srcs, "-lpng", "-lz", "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, so)
        return True
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        return False


def load() -> Optional[ctypes.CDLL]:
    """Build (if needed) and load the native library; None if unavailable."""
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        so = _so_path()
        if not os.path.exists(so):
            if not _build(so):
                return None
        lib = ctypes.CDLL(so)
        # dataloader
        lib.glslam_decode_png.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.c_int]
        lib.glslam_decode_png.restype = ctypes.c_int
        lib.glslam_loader_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_long, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.glslam_loader_create.restype = ctypes.c_void_p
        lib.glslam_loader_next.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)]
        lib.glslam_loader_next.restype = ctypes.c_long
        lib.glslam_loader_destroy.argtypes = [ctypes.c_void_p]
        # covis graph
        lib.covis_create.argtypes = [ctypes.c_long]
        lib.covis_create.restype = ctypes.c_void_p
        lib.covis_destroy.argtypes = [ctypes.c_void_p]
        lib.covis_add_keyframe.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.POINTER(ctypes.c_long),
            ctypes.c_long]
        lib.covis_query.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_long), ctypes.c_long,
            ctypes.c_long, ctypes.c_long, ctypes.c_long,
            ctypes.POINTER(ctypes.c_long), ctypes.c_long]
        lib.covis_query.restype = ctypes.c_long
        lib.covis_points_of.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_long), ctypes.c_long,
            ctypes.POINTER(ctypes.c_long), ctypes.c_long,
            ctypes.POINTER(ctypes.c_long), ctypes.c_long]
        lib.covis_points_of.restype = ctypes.c_long
        lib.covis_num_edges.argtypes = [ctypes.c_void_p]
        lib.covis_num_edges.restype = ctypes.c_long
        _LIB = lib
        return _LIB


def available() -> bool:
    return load() is not None


class NativeLoader:
    """Threaded native PNG prefetcher; in-order frame delivery."""

    def __init__(self, paths: Sequence[str], height: int, width: int,
                 depth: int = 4, threads: int = 2):
        lib = load()
        if lib is None:
            raise RuntimeError("native runtime unavailable")
        self._lib = lib
        self.h, self.w = height, width
        arr = (ctypes.c_char_p * len(paths))(
            *[p.encode() for p in paths])
        self._handle = lib.glslam_loader_create(arr, len(paths), height,
                                                width, depth, threads)
        self._buf = np.zeros((height, width), np.float32)

    def __iter__(self):
        while True:
            idx = self._lib.glslam_loader_next(
                self._handle,
                self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
            if idx == -1:
                return
            if idx == -2:
                continue
            yield int(idx), self._buf.copy()

    def close(self):
        if self._handle:
            self._lib.glslam_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def decode_png(path: str, height: int, width: int) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    out = np.zeros((height, width), np.float32)
    rc = lib.glslam_decode_png(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        height, width)
    return out if rc == 0 else None


class CovisGraph:
    """Exact covisibility graph (native); mirrors slam/state.py's top-C
    device approximation with unbounded host-side precision."""

    def __init__(self, edge_threshold: int = 50):
        lib = load()
        if lib is None:
            raise RuntimeError("native runtime unavailable")
        self._lib = lib
        self._g = lib.covis_create(edge_threshold)

    def add_keyframe(self, kf: int, mpids: np.ndarray):
        m = np.ascontiguousarray(mpids, np.int64)
        self._lib.covis_add_keyframe(
            self._g, kf, m.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
            len(m))

    def query(self, seed_mpids: np.ndarray, k1: int = 20, k2: int = 50,
              top_n: int = 5, max_out: int = 128) -> np.ndarray:
        s = np.ascontiguousarray(seed_mpids, np.int64)
        out = np.zeros(max_out, np.int64)
        n = self._lib.covis_query(
            self._g, s.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
            len(s), k1, k2, top_n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_long)), max_out)
        return out[:n]

    def points_of(self, kfs: np.ndarray, exclude: np.ndarray,
                  max_out: int = 2048) -> np.ndarray:
        k = np.ascontiguousarray(kfs, np.int64)
        e = np.ascontiguousarray(exclude, np.int64)
        out = np.zeros(max_out, np.int64)
        n = self._lib.covis_points_of(
            self._g, k.ctypes.data_as(ctypes.POINTER(ctypes.c_long)), len(k),
            e.ctypes.data_as(ctypes.POINTER(ctypes.c_long)), len(e),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_long)), max_out)
        return out[:n]

    @property
    def num_edges(self) -> int:
        return int(self._lib.covis_num_edges(self._g))

    def __del__(self):
        try:
            self._lib.covis_destroy(self._g)
        except Exception:
            pass
