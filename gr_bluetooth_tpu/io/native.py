"""ctypes bindings for the native I/O runtime (native/btio.cc).

Builds libbtio.so on demand with make (g++ is baked into the image);
callers fall back to pure-Python paths if the toolchain is unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB = None
_TRIED = False


def _build() -> str | None:
    so = os.path.abspath(os.path.join(_NATIVE_DIR, "libbtio.so"))
    src = os.path.abspath(os.path.join(_NATIVE_DIR, "btio.cc"))
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    try:
        subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                       check=True, capture_output=True, timeout=120)
        return so if os.path.exists(so) else None
    except Exception:
        return None


def load():
    """Load (building if needed) libbtio; returns None if unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = _build()
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    lib.bt_mktun.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.bt_mktun.restype = ctypes.c_int
    lib.bt_write_frame.argtypes = [
        ctypes.c_int, ctypes.c_char_p, ctypes.c_uint, ctypes.c_uint64,
        ctypes.c_uint64, ctypes.c_ushort]
    lib.bt_write_frame.restype = ctypes.c_int
    lib.bt_pcap_open.argtypes = [ctypes.c_char_p, ctypes.c_uint32]
    lib.bt_pcap_open.restype = ctypes.c_void_p
    lib.bt_pcap_write.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint32, ctypes.c_char_p,
        ctypes.c_uint32]
    lib.bt_pcap_write.restype = ctypes.c_int
    lib.bt_pcap_close.argtypes = [ctypes.c_void_p]
    lib.bt_ring_create.argtypes = [ctypes.c_int, ctypes.c_size_t,
                                   ctypes.c_int]
    lib.bt_ring_create.restype = ctypes.c_void_p
    lib.bt_ring_pop.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                ctypes.c_size_t]
    lib.bt_ring_pop.restype = ctypes.c_long
    lib.bt_ring_pop_wait.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                     ctypes.c_size_t, ctypes.c_int]
    lib.bt_ring_pop_wait.restype = ctypes.c_long
    lib.bt_ring_available.argtypes = [ctypes.c_void_p]
    lib.bt_ring_available.restype = ctypes.c_long
    lib.bt_ring_overruns.argtypes = [ctypes.c_void_p]
    lib.bt_ring_overruns.restype = ctypes.c_int
    lib.bt_ring_dropped.argtypes = [ctypes.c_void_p]
    lib.bt_ring_dropped.restype = ctypes.c_uint64
    lib.bt_ring_destroy.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib
