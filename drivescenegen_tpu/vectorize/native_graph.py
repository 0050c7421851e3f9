"""ctypes bindings for the native stage-2 graph kernels (native/dsg_graph.cpp).

Exposes find_paths / connect_paths — exact C++ ports of the Python BFS path
recovery in vectorize/network.py (reference: vectorization/graph/
extract_network.py:149-261). Auto-builds with g++ on first use; absence
degrades gracefully — network.py falls back to the Python implementation.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libdsg_graph.so"))

_lib = None
_lib_load_failed = False
_lib_lock = threading.Lock()


def _try_build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", os.path.abspath(_NATIVE_DIR), "libdsg_graph.so"],
            check=True, capture_output=True, timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load():
    global _lib, _lib_load_failed
    with _lib_lock:
        if _lib is not None:
            return _lib
        if _lib_load_failed:
            return None
        if not os.path.exists(_LIB_PATH) and not _try_build():
            _lib_load_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _lib_load_failed = True
            return None
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        lib.dsg_find_paths.restype = ctypes.c_int64
        lib.dsg_find_paths.argtypes = [
            u8p, ctypes.c_int32, ctypes.c_int32, i32p, ctypes.c_int64,
            i32p, ctypes.c_int64, i32p, ctypes.c_int64,
        ]
        lib.dsg_connect_paths.restype = ctypes.c_int64
        lib.dsg_connect_paths.argtypes = [
            u8p, ctypes.c_int32, ctypes.c_int32, i32p, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32,
            i32p, ctypes.c_int64, i32p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _prep(skel: np.ndarray, nodes: list) -> Tuple[np.ndarray, np.ndarray, int, int]:
    s = np.ascontiguousarray((np.asarray(skel) > 0).astype(np.uint8))
    W, H = s.shape  # [x][y] indexing, dim0 = x (network.py convention)
    nd = np.ascontiguousarray(np.asarray(nodes, np.int32).reshape(-1, 2))
    return s, nd, W, H


def _unpack(lens: np.ndarray, pix: np.ndarray, n: int) -> List[list]:
    total = int(lens[:n].sum())
    flat = pix[:total].tolist()  # C-speed conversion to [x, y] lists
    paths = []
    k = 0
    for i in range(n):
        m = int(lens[i])
        paths.append(list(map(tuple, flat[k : k + m])))
        k += m
    return paths


def _call(fn, s, nd, W, H, extra=()) -> Tuple[List[list], int]:
    lens_cap = max(4 * len(nd) + 64, 1024)
    pix_cap = 8 * W * H + 4096
    out_iters = ctypes.c_int32(0)
    for _ in range(4):
        lens = np.empty(lens_cap, np.int32)
        pix = np.empty(pix_cap, np.int32)
        args = [s, W, H, nd, len(nd), *extra, lens, lens_cap, pix, pix_cap]
        if fn is _load().dsg_connect_paths:
            args.append(ctypes.byref(out_iters))
        n = fn(*args)
        if n >= 0:
            return _unpack(lens, pix.reshape(-1, 2), int(n)), int(out_iters.value)
        lens_cap *= 4
        pix_cap *= 4
    raise RuntimeError("dsg_graph output capacity exceeded after retries")


def find_paths(skel: np.ndarray, nodes: list) -> List[list]:
    """Pixel paths between nodes — C++ port of network.find_paths.
    Returns a list of pixel-(x, y) lists (endpoints are node pixels)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native dsg_graph not available")
    s, nd, W, H = _prep(skel, nodes)
    paths, _ = _call(lib.dsg_find_paths, s, nd, W, H)
    return paths


def connect_paths(
    skel: np.ndarray, nodes: list, min_distance: int, max_merge_iters: int = 300
) -> Tuple[List[list], int]:
    """Flood + merge-until-stable loop — C++ port of network.connect_graph's
    inner loop. Returns (paths, merge_iters_used)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native dsg_graph not available")
    s, nd, W, H = _prep(skel, nodes)
    return _call(
        lib.dsg_connect_paths, s, nd, W, H,
        extra=(int(min_distance), int(max_merge_iters)),
    )
