"""Loader for the native host-runtime extension with numpy fallbacks.

The C extension (``native/dvbs2rx_native.c``) accelerates the host-side IO
loops: CRC-8 streams, u8<->fc32 conversion, TS stitching. Build with::

    cd native && python setup.py build_ext --inplace

If the extension is unavailable everything falls back to the numpy reference
implementations transparently.
"""

import glob
import importlib.util
import os

import numpy as np

_ext = None


def _load():
    global _ext
    if _ext is not None:
        return _ext
    try:
        # pip-installed build (setup.py places dvbs2rx_native on sys.path)
        import dvbs2rx_native as mod

        _ext = mod
        return _ext
    except ImportError:
        pass
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    for pat in ("native/dvbs2rx_native*.so", "native/build/**/dvbs2rx_native*.so"):
        hits = glob.glob(os.path.join(root, pat), recursive=True)
        if hits:
            spec = importlib.util.spec_from_file_location("dvbs2rx_native", hits[0])
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            _ext = mod
            return _ext
    _ext = False
    return _ext


def available() -> bool:
    return bool(_load())


def crc8(data: np.ndarray) -> int:
    ext = _load()
    if ext:
        return ext.crc8(np.asarray(data, np.uint8).tobytes())
    from ..spec.scramblers import crc8 as py_crc8

    return py_crc8(data)


def crc8_check_packets(buf: np.ndarray) -> np.ndarray:
    """buf: (N, 188) uint8 of [187 data][crc] chunks -> (N,) bool."""
    ext = _load()
    buf = np.ascontiguousarray(buf, np.uint8)
    if ext:
        flags = ext.crc8_check_packets(buf.tobytes())
        return np.frombuffer(flags, np.uint8).astype(bool)
    from ..spec.scramblers import crc8_check

    return np.array([crc8_check(row) for row in buf.reshape(-1, 188)])


def u8_to_fc32(raw: np.ndarray) -> np.ndarray:
    ext = _load()
    if ext:
        out = ext.u8_to_fc32(np.asarray(raw, np.uint8).tobytes())
        return np.frombuffer(out, np.float32).view(np.complex64)
    x = (np.asarray(raw, np.uint8).astype(np.float32) - 127.5) / 127.5
    return (x[0::2] + 1j * x[1::2]).astype(np.complex64)


def fc32_to_u8(iq: np.ndarray, scale: float = 0.9) -> np.ndarray:
    ext = _load()
    x = np.empty(np.asarray(iq).size * 2, np.float32)
    x[0::2] = np.real(iq)
    x[1::2] = np.imag(iq)
    if ext:
        return np.frombuffer(ext.fc32_to_u8(x.tobytes(), scale), np.uint8)
    return np.clip(np.rint(x * scale * 127.5 + 127.5), 0, 255).astype(np.uint8)


def ts_stitch(datafield: np.ndarray, partial: np.ndarray, synched: bool,
              syncd_bytes: int):
    """Returns (ts uint8 array, new_partial uint8 array, n_errors int)."""
    ext = _load()
    if ext:
        ts, new_partial, n_err = ext.ts_stitch(
            _as_buf(datafield), _as_buf(partial), bool(synched),
            int(syncd_bytes),
        )
        return (
            np.frombuffer(ts, np.uint8),
            np.frombuffer(new_partial, np.uint8),
            int(n_err),
        )
    raise NotImplementedError  # callers use BBFrameParser when unavailable


def has_ts_stitch_flagged() -> bool:
    ext = _load()
    return bool(ext) and hasattr(ext, "ts_stitch_flagged")


def _as_buf(a):
    """Zero-copy buffer handoff when the array is already contiguous u8
    (the hot-loop case); the C side takes any buffer-protocol object."""
    a = np.asarray(a, np.uint8)
    return a if a.flags["C_CONTIGUOUS"] else np.ascontiguousarray(a)


def ts_stitch_flagged(datafield: np.ndarray, partial: np.ndarray,
                      synched: bool, syncd_bytes: int, ok_map: np.ndarray,
                      base_idx: int):
    """``ts_stitch`` with device-precomputed packet validity
    (``ops/crc8_dev.packet_validity`` packed map; ``base_idx`` = the
    datafield's byte offset inside the frame). Only the one cross-frame
    packet per call computes a CRC on the host. Returns read-only views
    over the C-allocated buffers (callers only read/concatenate)."""
    ext = _load()
    ts, new_partial, n_err = ext.ts_stitch_flagged(
        _as_buf(datafield), _as_buf(partial), bool(synched),
        int(syncd_bytes), _as_buf(ok_map), int(base_idx),
    )
    return (
        np.frombuffer(ts, np.uint8),
        np.frombuffer(new_partial, np.uint8),
        int(n_err),
    )
