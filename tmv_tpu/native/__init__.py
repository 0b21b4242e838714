"""ctypes bindings for the native preprocessing library.

``native/preproc.cc`` fuses JPEG decode + proportional letterbox + /255
normalization into one C++ pass with a threaded batch API — the native
equivalent of the reference's Python/OpenCV per-sample preprocessing
(`datasets/coco_dataset.py`, `views/object_detection.py:46-63`).

The library is built on demand (``make -C native``); every entry point
falls back to the PIL/numpy implementation when the .so is absent, so the
framework never hard-depends on the toolchain.
"""

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SO_PATH = os.path.join(_REPO_ROOT, "native", "libtmv_preproc.so")

_lib = None


def _load(build_if_missing: bool = True):
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH) and build_if_missing:
        try:
            subprocess.run(
                ["make", "-C", os.path.join(_REPO_ROOT, "native")],
                check=True, capture_output=True,
            )
        except Exception:
            return None
    if not os.path.exists(_SO_PATH):
        return None
    lib = ctypes.CDLL(_SO_PATH)
    lib.tmv_decode_letterbox.restype = ctypes.c_int
    lib.tmv_decode_letterbox.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
    ]
    lib.tmv_decode_letterbox_batch.restype = None
    lib.tmv_decode_letterbox_batch.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_long), ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,
    ]
    lib.tmv_letterbox_rgb.restype = None
    lib.tmv_letterbox_rgb.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int),
    ]
    if hasattr(lib, "tmv_encode_jpeg"):  # present from r3 on
        lib.tmv_jpeg_dims.restype = ctypes.c_int
        lib.tmv_jpeg_dims.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.tmv_decode_letterbox_full.restype = ctypes.c_int
        lib.tmv_decode_letterbox_full.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_ubyte),
        ]
        lib.tmv_encode_jpeg.restype = ctypes.c_long
        lib.tmv_encode_jpeg.argtypes = [
            ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte), ctypes.c_long,
        ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _fallback_decode_letterbox(jpeg_bytes: bytes, th: int, tw: int):
    from tmv_tpu.utils import image_helper

    img = image_helper.bytes_to_image(jpeg_bytes)
    out, _, padding = image_helper.proportional_resize(img, (tw, th))
    meta = np.asarray(
        [padding[0], padding[2], img.shape[0], img.shape[1]], np.int32)
    return out.astype(np.float32) / 255.0, meta


def decode_letterbox(jpeg_bytes: bytes, target_hw: Tuple[int, int]):
    """JPEG bytes → (float32 (H, W, 3) [0,1], meta[pad_y, pad_x, sh, sw])."""
    th, tw = target_hw
    lib = _load()
    if lib is None:
        return _fallback_decode_letterbox(jpeg_bytes, th, tw)
    out = np.empty((th, tw, 3), np.float32)
    meta = np.empty((4,), np.int32)
    rc = lib.tmv_decode_letterbox(
        jpeg_bytes, len(jpeg_bytes), th, tw,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        meta.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    if rc != 0:
        return _fallback_decode_letterbox(jpeg_bytes, th, tw)
    return out, meta


def decode_letterbox_batch(jpeg_list: List[bytes],
                           target_hw: Tuple[int, int],
                           threads: int = 0):
    """Threaded batch decode+letterbox → ((N, H, W, 3) f32, (N, 4) meta)."""
    th, tw = target_hw
    n = len(jpeg_list)
    lib = _load()
    if lib is None:
        outs, metas = zip(*(
            _fallback_decode_letterbox(b, th, tw) for b in jpeg_list))
        return np.stack(outs), np.stack(metas)
    blob = b"".join(jpeg_list)
    offsets = np.zeros((n + 1,), np.int64)
    np.cumsum([len(b) for b in jpeg_list], out=offsets[1:])
    out = np.empty((n, th, tw, 3), np.float32)
    meta = np.empty((n, 4), np.int32)
    statuses = np.empty((n,), np.int32)
    lib.tmv_decode_letterbox_batch(
        blob, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_long)), n,
        th, tw, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        meta.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        statuses.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), threads,
    )
    for i in np.nonzero(statuses)[0]:
        out[i], meta[i] = _fallback_decode_letterbox(jpeg_list[i], th, tw)
    return out, meta


def decode_letterbox_full(jpeg_bytes: bytes, target_hw: Tuple[int, int]):
    """Serving hot path: ONE JPEG decode → (full-res uint8 RGB image,
    letterboxed float32 [0,1] frame, meta[pad_y, pad_x, sh, sw]).

    Returns None if the native library is absent or lacks the entry point
    (old .so) or the decode fails — callers fall back to PIL.
    """
    th, tw = target_hw
    lib = _load()
    if lib is None or not hasattr(lib, "tmv_decode_letterbox_full"):
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.tmv_jpeg_dims(jpeg_bytes, len(jpeg_bytes),
                         ctypes.byref(w), ctypes.byref(h)):
        return None
    rgb = np.empty((h.value, w.value, 3), np.uint8)
    out = np.empty((th, tw, 3), np.float32)
    meta = np.empty((4,), np.int32)
    rc = lib.tmv_decode_letterbox_full(
        jpeg_bytes, len(jpeg_bytes), th, tw,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        meta.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
    )
    if rc != 0:
        return None
    return rgb, out, meta


def encode_jpeg(img: np.ndarray, quality: int = 75) -> Optional[bytes]:
    """RGB8 (H, W, 3) → JPEG bytes via libjpeg (PIL-default quality 75).

    Returns None if the native library is absent/old or encoding fails —
    callers fall back to PIL.
    """
    lib = _load()
    if lib is None or not hasattr(lib, "tmv_encode_jpeg"):
        return None
    img = np.ascontiguousarray(img, np.uint8)
    h, w = img.shape[0], img.shape[1]
    cap = h * w * 3 + 4096
    out = np.empty((cap,), np.uint8)
    n = lib.tmv_encode_jpeg(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), h, w,
        int(quality), out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        cap)
    if n <= 0:
        return None
    return out[:n].tobytes()
