"""ctypes binding for the native chunk decoder (libchunkdec.so).

Builds lazily with the in-tree Makefile on first use; every call has a
pure-numpy fallback (tpu3dsis.io) so the framework runs without a
toolchain. ``SceneDataset`` routes through :func:`decode_chunk_native`
when available — one native pass replaces the struct-unpack reader, the
clip/abs/occupancy encode, and the mask-canvas paint.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libchunkdec.so")
_lock = threading.Lock()
_lib = None
_tried = False


class _Header(ctypes.Structure):
    _fields_ = [
        ("dim_x", ctypes.c_uint64),
        ("dim_y", ctypes.c_uint64),
        ("dim_z", ctypes.c_uint64),
        ("num_boxes", ctypes.c_uint32),
        ("num_masks", ctypes.c_uint32),
        ("num_images", ctypes.c_uint32),
    ]


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(
                    ["make", "-s", "libchunkdec.so"],
                    cwd=_HERE,
                    check=True,
                    capture_output=True,
                )
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.chunk_peek.restype = ctypes.c_int
        lib.chunk_peek.argtypes = [
            ctypes.c_char_p, ctypes.c_uint64, ctypes.POINTER(_Header)
        ]
        lib.chunk_decode.restype = ctypes.c_int
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
        lib.chunk_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_uint64, ctypes.c_float, ctypes.c_int,
            f32p, f32p, u32p, f32p, f32p, u32p, ctypes.c_void_p,
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def decode_chunk_native(path: str, truncation: float, encode_mode: int = 0,
                        with_canvas: bool = True):
    """One-pass decode+encode. Returns None when the library is unavailable.

    -> dict(data (X,Y,Z,2) f32, boxes (N,6) f32 raw, labels (N,) u32,
       fractions (N,) f32, world2chunk_raw (4,4) f32, frame_ids (M,) u32,
       mask_canvas (X,Y,Z) f32 | None)
    """
    lib = _load()
    if lib is None:
        return None
    with open(path, "rb") as f:
        buf = f.read()
    h = _Header()
    rc = lib.chunk_peek(buf, len(buf), ctypes.byref(h))
    if rc != 0:
        raise EOFError(f"malformed chunk file {path} (rc={rc})")
    dx, dy, dz = int(h.dim_x), int(h.dim_y), int(h.dim_z)
    nb, ni = int(h.num_boxes), int(h.num_images)
    data = np.empty((dx, dy, dz, 2), np.float32)
    boxes = np.empty((max(nb, 1), 6), np.float32)
    labels = np.empty((max(nb, 1),), np.uint32)
    fracs = np.empty((max(nb, 1),), np.float32)
    w2c = np.empty((16,), np.float32)
    fids = np.empty((max(ni, 1),), np.uint32)
    canvas = (
        np.empty((dx, dy, dz), np.float32) if with_canvas else None
    )
    rc = lib.chunk_decode(
        buf, len(buf), ctypes.c_float(truncation), int(encode_mode),
        data, boxes, labels, fracs, w2c, fids,
        canvas.ctypes.data_as(ctypes.c_void_p) if canvas is not None else None,
    )
    if rc != 0:
        raise EOFError(f"malformed chunk file {path} (rc={rc})")
    return {
        "data": data,
        "boxes": boxes[:nb],
        "labels": labels[:nb],
        "fractions": fracs[:nb],
        "world2chunk_raw": w2c.reshape(4, 4),
        "frame_ids": fids[:ni],
        "mask_canvas": canvas,
    }
