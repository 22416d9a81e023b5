"""Loader/builder for the native C++ components.

- native/packing.cpp — wire bit-packing, bound through ctypes; pure-numpy
  fallback in flashe_tpu/ops/pack.py.
- native/fedbroker.cpp — the federation exchange executable (the TPU-era
  equivalent of the reference's Java proxy/federation services); spawned
  by flashe_tpu/fed/tcp.py, which keeps a pure-Python fallback broker.

Everything builds on first use (g++ is part of the toolchain), so the
framework also works without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_here, "native", "packing.cpp")
_LIB = os.path.join(_here, "native", "libflashepack.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _compile(src: str, out: str, flags: list[str]):
    """Compile to a per-process temp path, then os.replace() onto the
    target: multiple federated-job processes may build concurrently, and
    an atomic rename guarantees no process ever dlopen()s/execs a
    partially written file."""
    tmp = f"{out}.tmp{os.getpid()}"
    try:
        subprocess.run(["g++", *flags, "-o", tmp, src],
                       check=True, capture_output=True)
        os.replace(tmp, out)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def build_lib(src_name: str, lib_name: str):
    """Compile native/<src_name> into a shared library on first use and
    return its CDLL handle (None when no compiler is available — callers
    keep a pure-python fallback)."""
    src = os.path.join(_here, "native", src_name)
    out = os.path.join(_here, "native", lib_name)
    with _lock:
        try:
            if not os.path.exists(out) or (
                os.path.getmtime(out) < os.path.getmtime(src)
            ):
                _compile(src, out, ["-O2", "-shared", "-fPIC"])
            return ctypes.CDLL(out)
        except Exception:
            return None


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_LIB) or (
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
            ):
                _compile(_SRC, _LIB, ["-O3", "-shared", "-fPIC"])
            lib = ctypes.CDLL(_LIB)
            lib.pack_lanes_u32.argtypes = [
                ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64,
                ctypes.c_int32, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_uint8),
            ]
            lib.unpack_lanes_u32.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                ctypes.c_int32, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_uint32),
            ]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


_BROKER_SRC = os.path.join(_here, "native", "fedbroker.cpp")
_BROKER_BIN = os.path.join(_here, "native", "fedbroker")
_broker_lock = threading.Lock()
_broker_state = {"tried": False, "path": None}


def broker_binary() -> str | None:
    """Builds (if stale) and returns the fedbroker executable path, or
    None when no compiler is available."""
    with _broker_lock:
        if _broker_state["tried"]:
            return _broker_state["path"]
        _broker_state["tried"] = True
        try:
            if not os.path.exists(_BROKER_BIN) or (
                os.path.getmtime(_BROKER_BIN) < os.path.getmtime(_BROKER_SRC)
            ):
                _compile(_BROKER_SRC, _BROKER_BIN, ["-O3", "-pthread"])
            _broker_state["path"] = _BROKER_BIN
        except Exception:
            _broker_state["path"] = None
        return _broker_state["path"]


_KVSRV_SRC = os.path.join(_here, "native", "kvserver.cpp")
_KVSRV_BIN = os.path.join(_here, "native", "kvserver")
_kvsrv_lock = threading.Lock()
_kvsrv_state = {"tried": False, "path": None}


def kvserver_binary() -> str | None:
    """Builds (if stale) and returns the storage-node executable
    (native/kvserver.cpp), or None when no compiler is available."""
    with _kvsrv_lock:
        if _kvsrv_state["tried"]:
            return _kvsrv_state["path"]
        _kvsrv_state["tried"] = True
        try:
            src_mtime = max(os.path.getmtime(_KVSRV_SRC),
                            os.path.getmtime(
                                os.path.join(_here, "native",
                                             "kvstore.cpp")))
            if not os.path.exists(_KVSRV_BIN) or (
                os.path.getmtime(_KVSRV_BIN) < src_mtime
            ):
                _compile(_KVSRV_SRC, _KVSRV_BIN,
                         ["-O2", "-pthread", "-I",
                          os.path.join(_here, "native")])
            _kvsrv_state["path"] = _KVSRV_BIN
        except Exception:
            _kvsrv_state["path"] = None
        return _kvsrv_state["path"]


def pack_lanes(lanes: np.ndarray, int_bits: int) -> bytes | None:
    lib = _load()
    if lib is None:
        return None
    lanes = np.ascontiguousarray(lanes, dtype=np.uint32)
    nlimbs = 1 if lanes.ndim == 1 else lanes.shape[-1]
    n = lanes.shape[0]
    out = np.zeros((n * int_bits + 7) // 8, np.uint8)
    lib.pack_lanes_u32(
        lanes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        ctypes.c_int64(n), ctypes.c_int32(nlimbs), ctypes.c_int32(int_bits),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out.tobytes()


def unpack_lanes(data: bytes, n: int, int_bits: int,
                 nlimbs: int) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    buf = np.frombuffer(data, np.uint8)
    out = np.zeros(n * nlimbs, np.uint32)
    lib.unpack_lanes_u32(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(n), ctypes.c_int32(nlimbs), ctypes.c_int32(int_bits),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))
    return out.reshape(n, nlimbs) if nlimbs > 1 else out
