"""Native (C++) runtime components, loaded via ctypes.

Reference analog: TurboMind's host-side C++ engine substrate (src/turbomind/engine,
src/turbomind/memory).  Compiled lazily on first import (cc available in the image;
no pybind11 — plain C ABI).  Falls back silently to the pure-Python implementations
when a toolchain is unavailable.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

logger = logging.getLogger('lmdeploy_tpu')

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, 'libtpulmd.so')
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    src = os.path.join(_HERE, 'block_manager.cc')
    for cc in ('c++', 'g++', 'clang++'):
        try:
            subprocess.run([cc, '-O2', '-std=c++17', '-shared', '-fPIC',
                            '-o', _LIB_PATH, src],
                           check=True, capture_output=True, timeout=120)
            return True
        except (OSError, subprocess.SubprocessError):
            continue
    return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Return the loaded native library, building it on first use; None = fallback."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) or \
                os.path.getmtime(_LIB_PATH) < os.path.getmtime(
                    os.path.join(_HERE, 'block_manager.cc')):
            if not _build():
                logger.warning('native runtime unavailable (no C++ toolchain); '
                               'using pure-Python block manager')
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        i64, f64, vp = ctypes.c_int64, ctypes.c_double, ctypes.c_void_p
        pi64 = ctypes.POINTER(ctypes.c_int64)
        pi32 = ctypes.POINTER(ctypes.c_int32)
        lib.bm_create.restype = vp
        lib.bm_create.argtypes = [i64, i64]
        lib.bm_destroy.argtypes = [vp]
        lib.bm_num_free.restype = i64
        lib.bm_num_free.argtypes = [vp]
        lib.bm_allocate.restype = ctypes.c_int
        lib.bm_allocate.argtypes = [vp, i64, pi64, f64]
        lib.bm_free.restype = i64
        lib.bm_free.argtypes = [vp, pi64, i64]
        lib.bm_add_ref.restype = ctypes.c_int
        lib.bm_add_ref.argtypes = [vp, pi64, i64]
        lib.bm_touch.argtypes = [vp, pi64, i64, f64]
        lib.bm_ref_count.restype = i64
        lib.bm_ref_count.argtypes = [vp, i64]
        lib.trie_create.restype = vp
        lib.trie_create.argtypes = [vp]
        lib.trie_destroy.argtypes = [vp]
        lib.trie_match.restype = i64
        lib.trie_match.argtypes = [vp, pi32, i64, i64, pi64, f64]
        lib.trie_insert.restype = i64
        lib.trie_insert.argtypes = [vp, pi32, i64, pi64, i64, f64]
        lib.trie_evict.restype = i64
        lib.trie_evict.argtypes = [vp, i64]
        lib.trie_num_nodes.restype = i64
        lib.trie_num_nodes.argtypes = [vp]
        _lib = lib
        return _lib
