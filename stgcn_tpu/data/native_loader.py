"""ctypes bindings for the native C++ batch loader (native/npy_loader.cc).

``collate_batch_native`` loads + channel-strips + wrap-pads a whole batch of
.npy skeleton files into one float32 array with a C++ thread pool — the
native replacement for the reference's DataLoader-worker np.load path.  Falls
back transparently to the numpy implementation when the shared library has
not been built (``python -m stgcn_tpu.data.build_native``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

_LIB_NAME = "libstgcn_native.so"
_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SOURCE = os.path.join(_NATIVE_DIR, "npy_loader.cc")
_LIB_PATH = os.path.join(_NATIVE_DIR, _LIB_NAME)

_lib = None


def build(force: bool = False) -> str:
    """Compile the shared library with g++.  Returns the .so path."""
    if os.path.exists(_LIB_PATH) and not force:
        if not os.path.exists(_SOURCE) or (
                os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SOURCE)):
            return _LIB_PATH
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           _SOURCE, "-o", _LIB_PATH]
    subprocess.run(cmd, check=True)
    return _LIB_PATH


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.stgcn_collate_batch.restype = ctypes.c_int
    lib.stgcn_collate_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
    ]
    lib.stgcn_npy_frames.restype = ctypes.c_int64
    lib.stgcn_npy_frames.argtypes = [ctypes.c_char_p]
    lib.stgcn_last_error.restype = ctypes.c_char_p
    _lib = lib
    return lib


def available() -> bool:
    return _load_lib() is not None


def npy_frames(path: str) -> int:
    """Frame count of a .npy file without loading its data."""
    lib = _load_lib()
    if lib is None:
        raise RuntimeError("native loader not built")
    n = lib.stgcn_npy_frames(path.encode())
    if n < 0:
        raise IOError(f"cannot read npy header: {path}")
    return int(n)


def collate_batch_native(
    paths: list[str], target_t: int, v: int = 25, keep_c: int = 2,
    out: np.ndarray | None = None, n_threads: int = 0,
) -> np.ndarray:
    """Load ``paths`` into a ``(len(paths), target_t, v, keep_c)`` float32
    batch, wrap-padding/cropping each sequence's time axis (reference
    semantics, src/data/util.py:12-47)."""
    lib = _load_lib()
    n = len(paths)
    if out is None:
        out = np.empty((n, target_t, v, keep_c), np.float32)
    else:
        assert out.shape == (n, target_t, v, keep_c) and out.dtype == np.float32
        assert out.flags["C_CONTIGUOUS"]
    if lib is None:
        # numpy fallback
        from stgcn_tpu.data.collate import wrap_pad
        for i, p in enumerate(paths):
            seq = np.load(p).astype(np.float32)[:, :, :keep_c]
            out[i] = wrap_pad(seq, target_t)
        return out
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.stgcn_collate_batch(
        c_paths, n, target_t, v, keep_c,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_threads)
    if rc != 0:
        raise IOError(lib.stgcn_last_error().decode())
    return out


if __name__ == "__main__":
    path = build(force="--force" in sys.argv)
    print(f"built {path}")
