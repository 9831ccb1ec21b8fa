"""ctypes bindings for the native C++ image decoder (native/dasac_io.cpp).

Builds on demand (make -C native), falls back to PIL when the library or a
particular file format is unavailable.  The batch call releases the GIL for
the whole decode+resize, so host threads scale past Python.
"""

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libdasac_io.so")

_lib = None
_tried = False


def _build():
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR, "-s"], check=True,
                       capture_output=True)
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.isfile(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.dasac_decode_pair.restype = ctypes.c_int
    lib.dasac_decode_pair.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int,
    ]
    lib.dasac_decode_batch.restype = ctypes.c_int
    lib.dasac_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int,
    ]
    lib.dasac_png_info.restype = ctypes.c_int
    lib.dasac_png_info.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    _lib = lib
    return _lib


_enabled = True


def set_enabled(flag):
    """Gate the native decoder (cfg TPU.NATIVE_LOADER); PIL path otherwise."""
    global _enabled
    _enabled = bool(flag)


def available():
    return _enabled and get_lib() is not None


def _as_u8_ptr(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def decode_pair(img_path, mask_path, out_hw, mask_fill=255):
    """Decode+resize one pair natively; returns (img, mask) or None."""
    if not _enabled:
        return None
    lib = get_lib()
    if lib is None:
        return None
    h, w = out_hw
    img = np.empty((h, w, 3), np.uint8)
    mask = np.empty((h, w), np.uint8)
    rc = lib.dasac_decode_pair(
        img_path.encode(), mask_path.encode() if mask_path else None,
        h, w, _as_u8_ptr(img), _as_u8_ptr(mask), mask_fill)
    if rc != 0:
        return None
    return img, mask


def decode_batch(img_paths, mask_paths, out_hw, threads=8, mask_fill=255):
    """Decode+resize a whole batch natively.

    Returns (imgs [N,H,W,3], masks [N,H,W], status [N]); entries with
    nonzero status must be re-decoded by the caller (PIL fallback).
    Returns None when the native library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    n = len(img_paths)
    h, w = out_hw
    imgs = np.empty((n, h, w, 3), np.uint8)
    masks = np.empty((n, h, w), np.uint8)
    status = np.zeros(n, np.int32)

    c_imgs = (ctypes.c_char_p * n)(*[p.encode() for p in img_paths])
    c_masks = (ctypes.c_char_p * n)(
        *[(p.encode() if p else None) for p in mask_paths])
    lib.dasac_decode_batch(
        c_imgs, c_masks, n, h, w, _as_u8_ptr(imgs), _as_u8_ptr(masks),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), threads,
        mask_fill)
    return imgs, masks, status


def png_info(path):
    lib = get_lib()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.dasac_png_info(path.encode(), ctypes.byref(w), ctypes.byref(h)):
        return None
    return h.value, w.value
