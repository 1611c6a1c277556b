"""Native (C++) host-runtime components.

The reference's host-side hot paths lean on third-party native code (numba,
faiss, ATen — SURVEY.md §2.4). Here the host runtime pieces that stay off the
TPU (text ingestion, CSR assembly) get first-party C++ implementations,
loaded via ctypes; every entry point has a Python fallback and returns None /
raises ImportError when the shared library hasn't been built.

Build: ``python -m recommendation_tpu.native.build`` (uses g++, no pip deps).
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional

_LIB = None
_LIB_TRIED = False


def _lib_path() -> str:
    return os.path.join(os.path.dirname(__file__), "librec_native.so")


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_TRIED
    if not _LIB_TRIED:
        _LIB_TRIED = True
        path = _lib_path()
        if os.path.exists(path):
            try:
                _LIB = ctypes.CDLL(path)
            except OSError:
                _LIB = None
    return _LIB


def parse_triples_native(path: str, with_weight: bool = True) -> Optional[List[list]]:
    """C++ triple parser; None if the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    from recommendation_tpu.native.loader import parse_triples

    return parse_triples(lib, path, with_weight)
