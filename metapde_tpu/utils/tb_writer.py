"""TensorBoard event writer: ctypes binding to the native C++ core
(native/tb_writer.cpp) with a byte-identical pure-Python fallback.

Replaces the reference's tensorflow-backed Logger
(src/util/tensorboard_logger.py:14-75) without the TF dependency. Event
files are readable by standard TensorBoard.
"""

import ctypes
import os
import struct
import time
import zlib  # noqa: F401  (kept for doc parity; crc32c implemented below)

import numpy as np

_LIB = None
_TRIED = False


def _load_native():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                      "libtbwriter.so")
    so = os.path.abspath(so)
    if not os.path.exists(so):
        # try building in place
        mk = os.path.dirname(so)
        if os.path.exists(os.path.join(mk, "Makefile")):
            os.system(f"make -C {mk} >/dev/null 2>&1")
    if os.path.exists(so):
        try:
            lib = ctypes.CDLL(so)
            lib.tbw_open.restype = ctypes.c_void_p
            lib.tbw_open.argtypes = [ctypes.c_char_p, ctypes.c_double]
            lib.tbw_scalar.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
                ctypes.c_float, ctypes.c_double,
            ]
            lib.tbw_histogram.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
                ctypes.c_int, ctypes.c_double, ctypes.c_double,
                ctypes.c_double, ctypes.c_double, ctypes.c_double,
                ctypes.c_double,
            ]
            lib.tbw_close.argtypes = [ctypes.c_void_p]
            _LIB = lib
        except OSError:
            _LIB = None
    return _LIB


# ---------------------------------------------------------------- fallback
_CRC_TABLE = None


def _crc32c(data: bytes) -> int:
    global _CRC_TABLE
    if _CRC_TABLE is None:
        poly = 0x82F63B78
        tbl = []
        for i in range(256):
            c = i
            for _ in range(8):
                c = (poly ^ (c >> 1)) if (c & 1) else (c >> 1)
            tbl.append(c)
        _CRC_TABLE = tbl
    c = 0xFFFFFFFF
    for b in data:
        c = _CRC_TABLE[(c ^ b) & 0xFF] ^ (c >> 8)
    return c ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = _crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def _varint(v: int) -> bytes:
    out = b""
    while v >= 0x80:
        out += bytes([(v & 0x7F) | 0x80])
        v >>= 7
    return out + bytes([v])


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _pb_double(field, v):
    return _tag(field, 1) + struct.pack("<d", v)


def _pb_float(field, v):
    return _tag(field, 5) + struct.pack("<f", v)


def _pb_int64(field, v):
    return _tag(field, 0) + _varint(v)


def _pb_bytes(field, v: bytes):
    return _tag(field, 2) + _varint(len(v)) + v


def _encode_event(wall_time, step=None, file_version=None, summary=None):
    e = _pb_double(1, wall_time)
    if step is not None:
        e += _pb_int64(2, step)
    if file_version is not None:
        e += _pb_bytes(3, file_version.encode())
    if summary is not None:
        e += _pb_bytes(5, summary)
    return e


def _scalar_summary(tag, value):
    v = _pb_bytes(1, tag.encode()) + _pb_float(2, value)
    return _pb_bytes(1, v)


def _histo_summary(tag, limits, counts, mn, mx, num, total, total_sq):
    h = (_pb_double(1, mn) + _pb_double(2, mx) + _pb_double(3, num)
         + _pb_double(4, total) + _pb_double(5, total_sq))
    h += _pb_bytes(6, struct.pack(f"<{len(limits)}d", *limits))
    h += _pb_bytes(7, struct.pack(f"<{len(counts)}d", *counts))
    v = _pb_bytes(1, tag.encode()) + _pb_bytes(5, h)
    return _pb_bytes(1, v)


class EventWriter:
    """Writes TensorBoard event files; native C++ backend when available."""

    def __init__(self, logdir: str, prefer_native: bool = True):
        os.makedirs(logdir, exist_ok=True)
        fname = os.path.join(
            logdir, f"events.out.tfevents.{int(time.time())}.metapde"
        )
        self._lib = _load_native() if prefer_native else None
        if self._lib is not None:
            self._handle = self._lib.tbw_open(fname.encode(), time.time())
            self._f = None
            if not self._handle:
                self._lib = None
        if self._lib is None:
            self._f = open(fname, "wb")
            self._write_record(
                _encode_event(time.time(), file_version="brain.Event:2")
            )

    def _write_record(self, payload: bytes):
        header = struct.pack("<Q", len(payload))
        self._f.write(header)
        self._f.write(struct.pack("<I", _masked_crc(header)))
        self._f.write(payload)
        self._f.write(struct.pack("<I", _masked_crc(payload)))
        self._f.flush()

    def scalar(self, tag: str, value: float, step: int):
        if self._lib is not None:
            self._lib.tbw_scalar(self._handle, tag.encode(), step,
                                 float(value), time.time())
        else:
            self._write_record(
                _encode_event(time.time(), step, summary=_scalar_summary(
                    tag, float(value)))
            )

    def histogram(self, tag: str, values, step: int, bins: int = 30):
        values = np.asarray(values, np.float64).reshape(-1)
        if values.size == 0:
            return
        counts, edges = np.histogram(values, bins=bins)
        limits = edges[1:]
        args = (
            limits.tolist(), counts.astype(np.float64).tolist(),
            float(values.min()), float(values.max()), float(values.size),
            float(values.sum()), float((values ** 2).sum()),
        )
        if self._lib is not None:
            n = len(args[0])
            lim = (ctypes.c_double * n)(*args[0])
            cnt = (ctypes.c_double * n)(*args[1])
            self._lib.tbw_histogram(
                self._handle, tag.encode(), step, lim, cnt, n,
                *args[2:], time.time(),
            )
        else:
            self._write_record(
                _encode_event(time.time(), step,
                              summary=_histo_summary(tag, *args))
            )

    def close(self):
        if self._lib is not None:
            self._lib.tbw_close(self._handle)
            self._lib = None
        elif self._f is not None:
            self._f.close()
            self._f = None
