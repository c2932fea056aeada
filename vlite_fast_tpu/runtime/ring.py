"""Python bindings for the C++ shared-memory ring buffer (csrc/ringbuffer.cpp).

The ring is the host-side data plane between capture, DSP feed, and the
voltage dumper — PSRDADA's role in the reference (SURVEY.md section 2a #19).
Builds the shared library on first use (g++ via csrc/Makefile); ctypes, no
pybind11 dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

# repo checkout layout by default; pip-installed deployments point
# VFAST_CSRC at a csrc checkout or VFAST_LIB at a prebuilt libvfast.so
_CSRC = Path(os.environ.get("VFAST_CSRC",
                            Path(__file__).resolve().parents[2] / "csrc"))
_LIB_PATH = Path(os.environ.get("VFAST_LIB", _CSRC / "libvfast.so"))
_lib = None


def _build_lib() -> None:
    subprocess.run(["make", "-C", str(_CSRC)], check=True,
                   capture_output=True)


def get_lib() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    srcs = [_CSRC / "ringbuffer.cpp", _CSRC / "netcap.cpp"]
    if not _LIB_PATH.exists() and not _CSRC.exists():
        raise RuntimeError(
            f"native runtime not found: no {_LIB_PATH} and no csrc at "
            f"{_CSRC}; set VFAST_LIB to a prebuilt libvfast.so or "
            f"VFAST_CSRC to a csrc checkout (built with make)")
    if not _LIB_PATH.exists() or any(
            _LIB_PATH.stat().st_mtime < s.stat().st_mtime for s in srcs
            if s.exists()):
        _build_lib()
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.rb_create.restype = ctypes.c_void_p
    lib.rb_create.argtypes = [ctypes.c_char_p, ctypes.c_uint64,
                              ctypes.c_uint64]
    lib.rb_attach.restype = ctypes.c_void_p
    lib.rb_attach.argtypes = [ctypes.c_char_p]
    lib.rb_close.argtypes = [ctypes.c_void_p, ctypes.c_int]
    for name in ("rb_bufsz", "rb_nbufs", "rb_nfull", "rb_dropped"):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_uint64
        fn.argtypes = [ctypes.c_void_p]
    for name in ("rb_write", "rb_write_overwrite"):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_int64
        fn.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                       ctypes.c_uint64, ctypes.c_double, ctypes.c_uint64]
    lib.rb_read.restype = ctypes.c_int64
    lib.rb_read.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                            ctypes.c_uint64,
                            ctypes.POINTER(ctypes.c_double),
                            ctypes.POINTER(ctypes.c_uint64)]
    lib.rb_peek_seq.restype = ctypes.c_int64
    lib.rb_peek_seq.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                                ctypes.c_void_p, ctypes.c_uint64,
                                ctypes.POINTER(ctypes.c_double)]
    lib.rb_resident.argtypes = [ctypes.c_void_p,
                                ctypes.POINTER(ctypes.c_uint64),
                                ctypes.POINTER(ctypes.c_uint64)]
    lib.rb_slot_timestamp.restype = ctypes.c_double
    lib.rb_slot_timestamp.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
    lib.udp_blast.restype = ctypes.c_int64
    lib.udp_blast.argtypes = [ctypes.c_int, ctypes.c_void_p,
                              ctypes.c_uint64, ctypes.c_uint64]
    lib.udp_drain.restype = ctypes.c_int64
    lib.udp_drain.argtypes = [ctypes.c_int, ctypes.c_void_p,
                              ctypes.c_uint64, ctypes.c_uint64,
                              ctypes.c_int,
                              ctypes.POINTER(ctypes.c_uint64)]
    lib.raw_drain.restype = ctypes.c_int64
    lib.raw_drain.argtypes = [ctypes.c_int, ctypes.c_void_p,
                              ctypes.c_uint64, ctypes.c_uint16,
                              ctypes.c_uint64, ctypes.c_int,
                              ctypes.POINTER(ctypes.c_uint64)]
    lib.rb_set_obs_header.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.rb_get_obs_header.restype = ctypes.c_uint64
    lib.rb_get_obs_header.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                      ctypes.c_uint64]
    _lib = lib
    return lib


# slot flag bits
FLAG_OBS_START = 1
FLAG_OBS_END = 2


class RingBuffer:
    """One named shm ring.  Slot-oriented: one slot = one second of baseband
    in the capture path (matching the reference's 1 s ring geometry,
    scripts/start_writer:12)."""

    def __init__(self, name: str, bufsz: int = 0, nbufs: int = 0,
                 create: bool = False):
        self._lib = get_lib()
        self.name = name
        if create:
            self._h = self._lib.rb_create(name.encode(), bufsz, nbufs)
        else:
            self._h = self._lib.rb_attach(name.encode())
        if not self._h:
            raise OSError(f"cannot {'create' if create else 'attach'} ring "
                          f"{name}")
        self._owner = create

    # --- geometry ---------------------------------------------------------
    @property
    def bufsz(self) -> int:
        return self._lib.rb_bufsz(self._h)

    @property
    def nbufs(self) -> int:
        return self._lib.rb_nbufs(self._h)

    @property
    def nfull(self) -> int:
        return self._lib.rb_nfull(self._h)

    @property
    def dropped(self) -> int:
        return self._lib.rb_dropped(self._h)

    # --- writer -----------------------------------------------------------
    def write(self, data: np.ndarray, timestamp: float = 0.0,
              flags: int = 0, overwrite: bool = False) -> int:
        """Copy one slot in.  Returns slot seq; -1 if the ring was full and
        overwrite=False.  overwrite=True gives rolling-history semantics
        (the voltage-dump buffer: newest second replaces the oldest)."""
        buf = np.ascontiguousarray(data).view(np.uint8)
        fn = (self._lib.rb_write_overwrite if overwrite
              else self._lib.rb_write)
        return fn(self._h, buf.ctypes.data_as(ctypes.c_void_p), buf.nbytes,
                  float(timestamp), flags)

    # --- reader -----------------------------------------------------------
    def read(self) -> Optional[Tuple[np.ndarray, float, int]]:
        """Consume the next slot -> (data, timestamp, flags) or None."""
        out = np.empty(self.bufsz, dtype=np.uint8)
        ts = ctypes.c_double()
        fl = ctypes.c_uint64()
        n = self._lib.rb_read(self._h, out.ctypes.data_as(ctypes.c_void_p),
                              out.nbytes, ctypes.byref(ts), ctypes.byref(fl))
        if n < 0:
            return None
        return out[:n], ts.value, fl.value

    # --- viewer (dumper semantics) ---------------------------------------
    def resident(self) -> Tuple[int, int]:
        lo = ctypes.c_uint64()
        hi = ctypes.c_uint64()
        self._lib.rb_resident(self._h, ctypes.byref(lo), ctypes.byref(hi))
        return lo.value, hi.value

    def peek(self, seq: int) -> Optional[Tuple[np.ndarray, float]]:
        out = np.empty(self.bufsz, dtype=np.uint8)
        ts = ctypes.c_double()
        n = self._lib.rb_peek_seq(self._h, seq,
                                  out.ctypes.data_as(ctypes.c_void_p),
                                  out.nbytes, ctypes.byref(ts))
        if n < 0:
            return None
        return out[:n], ts.value

    def slot_timestamp(self, seq: int) -> float:
        return self._lib.rb_slot_timestamp(self._h, seq)

    # --- observation header ----------------------------------------------
    def set_obs_header(self, header: str) -> None:
        self._lib.rb_set_obs_header(self._h, header.encode())

    def get_obs_header(self) -> Tuple[str, int]:
        buf = ctypes.create_string_buffer(4096)
        seq = self._lib.rb_get_obs_header(self._h, buf, 4096)
        return buf.value.decode(), seq

    def close(self, unlink: bool = False) -> None:
        if self._h:
            self._lib.rb_close(self._h, 1 if (unlink or self._owner) else 0)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
