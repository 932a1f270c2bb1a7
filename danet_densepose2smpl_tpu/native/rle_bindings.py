"""ctypes bindings for the C++ RLE codec (falls back to data/rle.py numpy)."""

from __future__ import annotations

import ctypes

import numpy as np

from danet_densepose2smpl_tpu.native.build import load_library


def _lib():
    lib = load_library("rle")
    if lib is None:
        return None
    lib.rle_decode.restype = ctypes.c_int
    lib.rle_encode.restype = ctypes.c_int
    lib.rle_uncompress.restype = ctypes.c_int
    lib.rle_compress.restype = ctypes.c_int
    lib.dp_masks_decode.restype = ctypes.c_int
    return lib


_LIB = None
_TRIED = False


def available() -> bool:
    global _LIB, _TRIED
    if not _TRIED:
        _LIB = _lib()
        _TRIED = True
    return _LIB is not None


def decode_rle_native(rle: dict) -> np.ndarray | None:
    if not available():
        return None
    h, w = rle["size"]
    counts = rle["counts"]
    if isinstance(counts, (bytes, str)):
        s = counts.encode("ascii") if isinstance(counts, str) else counts
        buf = np.zeros(h * w + 2, np.int64)
        n = _LIB.rle_uncompress(s, len(s), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), buf.size)
        if n < 0:
            return None
        counts_arr = buf[:n]
    else:
        counts_arr = np.asarray(counts, np.int64)
    mask = np.zeros((h, w), np.uint8)
    rc = _LIB.rle_decode(
        counts_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(counts_arr),
        h, w, mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return mask if rc == 0 else None


def encode_rle_native(mask: np.ndarray) -> dict | None:
    if not available():
        return None
    mask = np.ascontiguousarray(mask, np.uint8)
    h, w = mask.shape
    buf = np.zeros(h * w + 1, np.int64)
    n = _LIB.rle_encode(
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    counts = buf[:n].tolist()
    return {"size": [h, w], "counts": counts}


def decode_dp_masks_native(dp_masks: list) -> np.ndarray | None:
    """14-part dp_masks list -> (256, 256) label image (one C call)."""
    if not available():
        return None
    all_counts = []
    offsets = [0]
    for rle in dp_masks:
        if rle:
            counts = rle["counts"]
            if isinstance(counts, (bytes, str)):
                return None  # compressed per-part: rare; let numpy path handle
            all_counts.extend(int(c) for c in counts)
        offsets.append(len(all_counts))
    while len(offsets) < 15:
        offsets.append(offsets[-1])
    counts_arr = np.asarray(all_counts, np.int64)
    off_arr = np.asarray(offsets[:15], np.int64)
    label = np.zeros((256, 256), np.uint8)
    rc = _LIB.dp_masks_decode(
        counts_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        off_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        label.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return label if rc == 0 else None
