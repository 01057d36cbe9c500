"""ctypes wrapper for the native C++ multithreaded frame preloader.

Builds native/loader.cpp on first use (g++, libjpeg/libpng) and exposes
batch decoders that fill one contiguous uint8 array from a list of paths.
Falls back to PIL transparently when the toolchain or libraries are absent,
so the pipeline never hard-depends on the native path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB: ctypes.CDLL | None = None
_TRIED = False


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


def _build_and_load() -> ctypes.CDLL | None:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        src = os.path.join(_repo_root(), "native", "loader.cpp")
        so = os.path.join(_repo_root(), "native", "libinstag_loader.so")
        try:
            if (not os.path.exists(so)
                    or os.path.getmtime(so) < os.path.getmtime(src)):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", src, "-o", so,
                     "-ljpeg", "-lpng", "-pthread"],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(so)
            lib.load_jpeg_batch.restype = ctypes.c_int
            lib.load_jpeg_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int,
                ctypes.c_int]
            lib.load_png_batch.restype = ctypes.c_int
            lib.load_png_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int]
            _LIB = lib
        except Exception as e:  # toolchain/libs missing -> PIL fallback
            print(f"[native_loader] build failed ({e}); using PIL fallback")
            _LIB = None
        return _LIB


def _paths_array(paths: list[str]):
    arr = (ctypes.c_char_p * len(paths))()
    arr[:] = [p.encode() for p in paths]
    return arr


def _pil_batch(paths: list[str], h: int, w: int, channels: int) -> np.ndarray:
    from PIL import Image
    out = np.empty((len(paths), h, w, channels), np.uint8)
    mode = "RGBA" if channels == 4 else "RGB"
    for i, p in enumerate(paths):
        out[i] = np.array(Image.open(p).convert(mode))
    return out


def load_jpeg_batch(paths: list[str], h: int, w: int,
                    num_threads: int = 0) -> np.ndarray:
    """[N, h, w, 3] uint8 from JPEG files, multithreaded native decode."""
    lib = _build_and_load()
    if lib is None:
        return _pil_batch(paths, h, w, 3)
    out = np.empty((len(paths), h, w, 3), np.uint8)
    fails = lib.load_jpeg_batch(
        _paths_array(paths), len(paths),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), h, w,
        num_threads)
    if fails:
        return _pil_batch(paths, h, w, 3)
    return out


def load_png_batch(paths: list[str], h: int, w: int, channels: int = 4,
                   num_threads: int = 0) -> np.ndarray:
    """[N, h, w, channels] uint8 from PNG files."""
    lib = _build_and_load()
    if lib is None:
        return _pil_batch(paths, h, w, channels)
    out = np.empty((len(paths), h, w, channels), np.uint8)
    fails = lib.load_png_batch(
        _paths_array(paths), len(paths),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), h, w, channels,
        num_threads)
    if fails:
        return _pil_batch(paths, h, w, channels)
    return out
