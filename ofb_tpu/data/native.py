"""ctypes bindings for the native data-prep library (native/ofb_dataprep.cpp).

Builds on first use (g++ via make) and falls back to PIL when the toolchain
or libjpeg is unavailable. API: stage JPEG bytes to fixed-size uint8 HWC
staging images, single or threaded batch.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_LIB = None
_TRIED = False
_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(_NATIVE_DIR, "libofb_dataprep.so")
    if not os.path.exists(so):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.ofb_stage_jpeg.restype = ctypes.c_int
    lib.ofb_stage_jpeg.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                   ctypes.c_int, ctypes.c_void_p]
    lib.ofb_stage_jpeg_batch.restype = ctypes.c_int
    lib.ofb_stage_jpeg_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_size_t),
        ctypes.c_int, ctypes.c_int, ctypes.c_void_p, ctypes.c_int]
    lib.ofb_resize_rgb.restype = None
    lib.ofb_resize_rgb.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                   ctypes.c_int, ctypes.c_void_p,
                                   ctypes.c_int, ctypes.c_int]
    _LIB = lib
    return _LIB


def native_available() -> bool:
    return _load() is not None


def stage_jpeg(data: bytes, staging: int) -> Optional[np.ndarray]:
    """One JPEG byte string -> (staging, staging, 3) uint8, or None on
    decode failure / missing native lib."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty((staging, staging, 3), np.uint8)
    rc = lib.ofb_stage_jpeg(data, len(data), staging,
                            out.ctypes.data_as(ctypes.c_void_p))
    return out if rc == 0 else None


def stage_jpeg_batch(datas: Sequence[bytes], staging: int,
                     nthreads: int = 4) -> Optional[np.ndarray]:
    """Batch of JPEG byte strings -> (n, staging, staging, 3) uint8.
    Failed decodes come back zero-filled (count reported by the lib)."""
    lib = _load()
    if lib is None:
        return None
    n = len(datas)
    out = np.empty((n, staging, staging, 3), np.uint8)
    arr_ptr = (ctypes.c_char_p * n)(*datas)
    arr_len = (ctypes.c_size_t * n)(*[len(d) for d in datas])
    lib.ofb_stage_jpeg_batch(arr_ptr, arr_len, n, staging,
                             out.ctypes.data_as(ctypes.c_void_p), nthreads)
    return out


def resize_rgb(img: np.ndarray, dw: int, dh: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.uint8)
    sh, sw = img.shape[:2]
    out = np.empty((dh, dw, 3), np.uint8)
    lib.ofb_resize_rgb(img.ctypes.data_as(ctypes.c_void_p), sw, sh,
                       out.ctypes.data_as(ctypes.c_void_p), dw, dh)
    return out


class NativeFolderDataset:
    """ImageFolder over JPEG files staged by the native library; falls back
    to PIL per-image on non-JPEG or decode failure."""

    def __init__(self, root: str, staging: int):
        from .datasets import scan_image_folder
        self.samples, _ = scan_image_folder(root)
        self.staging = staging

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        path, target = self.samples[i]
        with open(path, "rb") as f:
            data = f.read()
        arr = stage_jpeg(data, self.staging)
        if arr is None:
            from .datasets import _ResizeU8
            from PIL import Image
            import io
            arr = _ResizeU8(self.staging)(Image.open(io.BytesIO(data)))
        return arr, target
