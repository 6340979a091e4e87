"""ctypes bindings for the native NPZ episode reader (native/npz_reader.cc).

Loads episodes with a C++ thread pool (GIL released for the whole parse +
inflate), several times faster than numpy's single-threaded path for the
multi-MB compressed episodes the replay plane ingests. Falls back to numpy
transparently when the shared library hasn't been built
(`sh native/build.sh`).
"""

from __future__ import annotations

import ctypes
import os
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _find_lib() -> Optional[Path]:
    here = Path(__file__).resolve()
    for root in (here.parents[2], Path.cwd()):
        cand = root / "native" / "libnpz_reader.so"
        if cand.exists():
            return cand
    return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _find_lib()
    if path is None:
        return None
    lib = ctypes.CDLL(str(path))
    lib.npz_open.restype = ctypes.c_void_p
    lib.npz_open.argtypes = [ctypes.c_char_p]
    lib.npz_num_entries.argtypes = [ctypes.c_void_p]
    lib.npz_entry_name.restype = ctypes.c_char_p
    lib.npz_entry_name.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.npz_entry_descr.restype = ctypes.c_char_p
    lib.npz_entry_descr.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.npz_entry_ndim.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.npz_entry_dim.restype = ctypes.c_long
    lib.npz_entry_dim.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
    lib.npz_entry_nbytes.restype = ctypes.c_long
    lib.npz_entry_nbytes.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.npz_read_all.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p),
                                 ctypes.c_int]
    lib.npz_close.argtypes = [ctypes.c_void_p]
    lib.npz_last_error.restype = ctypes.c_char_p
    _LIB = lib
    return lib


def available() -> bool:
    return get_lib() is not None


def load_episode_native(path, n_threads: int = 0) -> Dict[str, np.ndarray]:
    """Parse + inflate one .npz with the C++ reader. Raises on failure."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native npz reader not built (sh native/build.sh)")
    h = lib.npz_open(os.fsencode(str(path)))
    if not h:
        raise IOError(f"npz_open failed: {lib.npz_last_error().decode()}")
    try:
        n = lib.npz_num_entries(h)
        arrays: Dict[str, np.ndarray] = {}
        ptrs = (ctypes.c_char_p * n)()
        order: List[str] = []
        for i in range(n):
            name = lib.npz_entry_name(h, i).decode()
            descr = lib.npz_entry_descr(h, i).decode()
            ndim = lib.npz_entry_ndim(h, i)
            shape = tuple(lib.npz_entry_dim(h, i, d) for d in range(ndim))
            arr = np.empty(shape, dtype=np.dtype(descr))
            assert arr.nbytes == lib.npz_entry_nbytes(h, i), (name, arr.nbytes)
            arrays[name] = arr
            order.append(name)
            ptrs[i] = ctypes.cast(arr.ctypes.data, ctypes.c_char_p)
        rc = lib.npz_read_all(h, ptrs, n_threads)
        if rc != 0:
            raise IOError(f"npz_read_all failed: {lib.npz_last_error().decode()}")
        return arrays
    finally:
        lib.npz_close(h)


def load_dir_native(directory, pattern: str = "**/*.npz", workers: int = 0):
    """Load every episode in a directory with a file-level thread pool on top
    of the per-file C++ inflate pool. Returns {path: episode}."""
    paths = sorted(Path(directory).glob(pattern))
    workers = workers or min(8, max(1, (os.cpu_count() or 4) // 2))
    out = {}
    with ThreadPoolExecutor(workers) as ex:
        for path, ep in zip(paths, ex.map(lambda p: load_episode_native(p, 2), paths)):
            out[str(path)] = ep
    return out
