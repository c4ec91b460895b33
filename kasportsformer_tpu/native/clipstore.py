"""Python bindings for the native clip store (ctypes; no pybind11 needed).

Writer (`write_store`) emits the KSF1 binary layout; `NativeClipStore` mmaps
it through the C++ library for zero-copy array views and threaded batch
gathers. The shared library is compiled on first use with g++ (cached next
to the source); everything degrades gracefully to numpy when a toolchain is
unavailable (`is_available()`).
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "clipstore.cpp")
_LIB_PATH = os.path.join(os.path.dirname(__file__), "_clipstore.so")
_lock = threading.Lock()
_lib = None

_DTYPES = {0: np.float32, 1: np.int32, 2: np.int64}
_DTYPE_CODES = {np.dtype(np.float32): 0, np.dtype(np.int32): 1,
                np.dtype(np.int64): 2}


def _build_library() -> str:
    if not os.path.exists(_LIB_PATH) or (
            os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
        # -mtune (not -march): the cached .so may be reused on a different
        # CPU than the build host; tune for the local one without emitting
        # ISA extensions that would SIGILL elsewhere.
        subprocess.run(
            ["g++", "-O3", "-mtune=native", "-shared", "-fPIC", "-std=c++17",
             "-o", _LIB_PATH, _SRC, "-lpthread"],
            check=True, capture_output=True)
    return _LIB_PATH


def _load() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is None:
            lib = ctypes.CDLL(_build_library())
            lib.ksf_open.restype = ctypes.c_void_p
            lib.ksf_open.argtypes = [ctypes.c_char_p]
            lib.ksf_close.argtypes = [ctypes.c_void_p]
            lib.ksf_num_arrays.restype = ctypes.c_int
            lib.ksf_num_arrays.argtypes = [ctypes.c_void_p]
            lib.ksf_array_name.restype = ctypes.c_char_p
            lib.ksf_array_name.argtypes = [ctypes.c_void_p, ctypes.c_int]
            lib.ksf_array_ndim.restype = ctypes.c_int
            lib.ksf_array_ndim.argtypes = [ctypes.c_void_p, ctypes.c_int]
            lib.ksf_array_dtype.restype = ctypes.c_int
            lib.ksf_array_dtype.argtypes = [ctypes.c_void_p, ctypes.c_int]
            lib.ksf_array_dims.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                           ctypes.POINTER(ctypes.c_uint64)]
            lib.ksf_array_data.restype = ctypes.c_void_p
            lib.ksf_array_data.argtypes = [ctypes.c_void_p, ctypes.c_int]
            lib.ksf_array_bytes.restype = ctypes.c_uint64
            lib.ksf_array_bytes.argtypes = [ctypes.c_void_p, ctypes.c_int]
            lib.ksf_gather_rows.argtypes = [
                ctypes.c_void_p, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
            _lib = lib
    return _lib


def is_available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def write_store(path: str, arrays: dict[str, np.ndarray]) -> None:
    """Write numeric arrays in the KSF1 layout (64-byte-aligned payloads)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(b"KSF1")
        f.write(struct.pack("<I", len(arrays)))
        offset = 8
        for name, arr in arrays.items():
            arr = np.ascontiguousarray(arr)
            code = _DTYPE_CODES[arr.dtype]
            name_b = name.encode()
            f.write(struct.pack("<I", len(name_b)))
            f.write(name_b)
            f.write(struct.pack("<I", code))
            f.write(struct.pack("<I", arr.ndim))
            f.write(struct.pack(f"<{arr.ndim}Q", *arr.shape))
            f.write(struct.pack("<Q", arr.nbytes))
            offset += 4 + len(name_b) + 4 + 4 + 8 * arr.ndim + 8
            pad = (-offset) % 64
            f.write(b"\0" * pad)
            offset += pad
            f.write(arr.tobytes())
            offset += arr.nbytes


class NativeClipStore:
    """mmap-backed store: `array(name)` is a zero-copy numpy view;
    `gather(name, indices)` is a threaded batched row copy."""

    def __init__(self, path: str):
        self._lib = _load()
        self._handle = self._lib.ksf_open(path.encode())
        if not self._handle:
            raise OSError(f"cannot open clip store {path}")
        self._index: dict[str, int] = {}
        self._meta: dict[str, tuple] = {}
        self._dtypes: dict[str, np.dtype] = {}
        for i in range(self._lib.ksf_num_arrays(self._handle)):
            name = self._lib.ksf_array_name(self._handle, i).decode()
            ndim = self._lib.ksf_array_ndim(self._handle, i)
            dims = (ctypes.c_uint64 * ndim)()
            self._lib.ksf_array_dims(self._handle, i, dims)
            self._index[name] = i
            self._meta[name] = tuple(int(d) for d in dims)
            self._dtypes[name] = np.dtype(
                _DTYPES[self._lib.ksf_array_dtype(self._handle, i)])

    def names(self) -> list[str]:
        return list(self._index)

    def shape(self, name: str) -> tuple:
        return self._meta[name]

    def array(self, name: str) -> np.ndarray:
        """Zero-copy read-only view into the mapped file."""
        i = self._index[name]
        nbytes = self._lib.ksf_array_bytes(self._handle, i)
        ptr = self._lib.ksf_array_data(self._handle, i)
        buf = (ctypes.c_uint8 * nbytes).from_address(ptr)
        arr = np.frombuffer(buf, dtype=self._dtypes[name]).reshape(
            self._meta[name])
        arr.flags.writeable = False
        return arr

    def gather(self, name: str, indices: np.ndarray,
               out: np.ndarray | None = None, n_threads: int = 0) -> np.ndarray:
        i = self._index[name]
        shape = self._meta[name]
        dtype = self._dtypes[name]
        indices = np.ascontiguousarray(indices, dtype=np.int32)
        batch_shape = (len(indices),) + shape[1:]
        if out is None:
            out = np.empty(batch_shape, dtype)
        assert out.shape == batch_shape and out.dtype == dtype
        self._lib.ksf_gather_rows(
            self._handle, i,
            indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(indices),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n_threads)
        return out

    def close(self) -> None:
        if self._handle:
            self._lib.ksf_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
