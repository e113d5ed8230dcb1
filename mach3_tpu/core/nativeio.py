"""Native columnar event IO (ctypes binding over native/m3io.cpp).

TPU-native counterpart of the reference's C++ data path (ROOT TTree IO feeding
``SetupExperimentMC``): the "M3EV" columnar binary format with mmap reads and
multithreaded CSV ingestion. Falls back to pure numpy when the shared library
is unavailable (the format is identical either way).
"""
from __future__ import annotations

import ctypes
import os
import struct as pystruct
import subprocess
from typing import Mapping

import numpy as np

from .logging import get_logger

_log = get_logger("nativeio")

_DTYPE_CODE = {np.dtype(np.float32): 0, np.dtype(np.float64): 1, np.dtype(np.int32): 2}
_CODE_DTYPE = {0: np.float32, 1: np.float64, 2: np.int32}

_MAGIC = b"M3EV0001"
_ALIGN = 64

_lib = None
_lib_tried = False


def _native_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native")


def _load_library():
    """Load (building if needed) libm3io.so; None if unavailable."""
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    so = os.path.join(_native_dir(), "libm3io.so")
    src = os.path.join(_native_dir(), "m3io.cpp")
    stale = (
        os.path.exists(so)
        and os.path.exists(src)
        and os.path.getmtime(src) > os.path.getmtime(so)
    )
    if (not os.path.exists(so) or stale) and os.path.exists(src):
        # The binary is NOT committed; it is always built from source here
        # (and rebuilt whenever the source is newer).
        try:
            subprocess.run(
                ["make", "-B", "-C", _native_dir()],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except (subprocess.SubprocessError, OSError) as e:
            _log.warning("Could not build libm3io.so (%s); using numpy fallback", e)
            return None
    if not os.path.exists(so):
        return None
    try:
        lib = ctypes.CDLL(so)
    except OSError as e:
        _log.warning("Could not load libm3io.so (%s); using numpy fallback", e)
        return None
    lib.m3io_write.restype = ctypes.c_int
    lib.m3io_read_header.restype = ctypes.c_int
    lib.m3io_read_columns_meta.restype = ctypes.c_int
    lib.m3io_read_column.restype = ctypes.c_int
    lib.m3io_parse_csv.restype = ctypes.c_long
    _lib = lib
    _log.info("Loaded native IO library %s", so)
    return _lib


def _align(x: int) -> int:
    return (x + _ALIGN - 1) // _ALIGN * _ALIGN


def write_events(path: str, columns: Mapping[str, np.ndarray]) -> None:
    """Write a columnar event file (native when available)."""
    names = list(columns)
    arrays = [np.ascontiguousarray(columns[n]) for n in names]
    n_events = len(arrays[0]) if arrays else 0
    for n, a in zip(names, arrays):
        if a.ndim != 1 or len(a) != n_events:
            raise ValueError(f"Column '{n}' must be 1-D of length {n_events}")
        if a.dtype not in _DTYPE_CODE:
            raise ValueError(f"Column '{n}' dtype {a.dtype} unsupported (f32/f64/i32)")

    lib = _load_library()
    if lib is not None:
        name_buf = b"".join(n.encode()[:63].ljust(64, b"\0") for n in names)
        dtypes = (ctypes.c_uint32 * len(names))(*[_DTYPE_CODE[a.dtype] for a in arrays])
        ptrs = (ctypes.c_void_p * len(names))(
            *[a.ctypes.data_as(ctypes.c_void_p) for a in arrays]
        )
        rc = lib.m3io_write(
            path.encode(), ctypes.c_uint64(n_events), ctypes.c_uint32(len(names)),
            name_buf, dtypes, ptrs,
        )
        if rc != 0:
            raise OSError(f"m3io_write failed with {rc}")
        return

    # numpy fallback — identical byte layout
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(pystruct.pack("<QII", n_events, len(names), 0))
        header_end = 8 + 16 + len(names) * 80
        offset = _align(header_end)
        descs = []
        for n, a in zip(names, arrays):
            descs.append((n, _DTYPE_CODE[a.dtype], offset))
            offset = _align(offset + a.nbytes)
        for n, code, off in descs:
            f.write(n.encode()[:63].ljust(64, b"\0"))
            f.write(pystruct.pack("<IIQ", code, 0, off))
        for a, (_, _, off) in zip(arrays, descs):
            f.seek(off)
            f.write(a.tobytes())


def read_events(path: str, n_threads: int = 4) -> dict[str, np.ndarray]:
    """Read a columnar event file into numpy arrays."""
    lib = _load_library()
    if lib is not None:
        n_events = ctypes.c_uint64()
        n_cols = ctypes.c_uint32()
        rc = lib.m3io_read_header(path.encode(), ctypes.byref(n_events), ctypes.byref(n_cols))
        if rc != 0:
            raise OSError(f"m3io_read_header failed with {rc}")
        names_buf = ctypes.create_string_buffer(64 * n_cols.value)
        dtypes = (ctypes.c_uint32 * n_cols.value)()
        rc = lib.m3io_read_columns_meta(path.encode(), names_buf, dtypes)
        if rc != 0:
            raise OSError(f"m3io_read_columns_meta failed with {rc}")
        out = {}
        for c in range(n_cols.value):
            name = names_buf.raw[64 * c : 64 * (c + 1)].split(b"\0")[0].decode()
            arr = np.empty(n_events.value, dtype=_CODE_DTYPE[dtypes[c]])
            rc = lib.m3io_read_column(
                path.encode(), ctypes.c_uint32(c),
                arr.ctypes.data_as(ctypes.c_void_p), ctypes.c_uint32(n_threads),
            )
            if rc != 0:
                raise OSError(f"m3io_read_column({name}) failed with {rc}")
            out[name] = arr
        return out

    # numpy fallback
    with open(path, "rb") as f:
        if f.read(8) != _MAGIC:
            raise OSError(f"{path} is not an M3EV file")
        n_events, n_cols, _ = pystruct.unpack("<QII", f.read(16))
        descs = []
        for _ in range(n_cols):
            name = f.read(64).split(b"\0")[0].decode()
            code, _, off = pystruct.unpack("<IIQ", f.read(16))
            descs.append((name, code, off))
        out = {}
        for name, code, off in descs:
            f.seek(off)
            dt = np.dtype(_CODE_DTYPE[code])
            out[name] = np.frombuffer(f.read(n_events * dt.itemsize), dtype=dt).copy()
        return out


def parse_csv(path: str, column_names: list[str], n_threads: int = 4) -> dict[str, np.ndarray]:
    """Parse a numeric CSV (with header) into f64 columns; native multithreaded
    parser when available."""
    lib = _load_library()
    if lib is None:
        data = np.genfromtxt(path, delimiter=",", skip_header=1, dtype=np.float64)
        data = np.atleast_2d(data)
        return {n: data[:, i].copy() for i, n in enumerate(column_names)}
    # count rows cheaply
    with open(path, "rb") as f:
        n_lines = sum(1 for _ in f) - 1
    out = np.empty((len(column_names), max(n_lines, 1)), np.float64)
    rc = lib.m3io_parse_csv(
        path.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_uint64(out.shape[1]),
        ctypes.c_uint32(len(column_names)),
        ctypes.c_uint32(n_threads),
    )
    if rc < 0:
        raise OSError(f"m3io_parse_csv failed with {rc}")
    return {n: out[i, : int(rc)].copy() for i, n in enumerate(column_names)}
