"""ctypes loader for the native host-runtime library (C++: map generation,
trajectory rasterization). Compiles on first use if a toolchain is present;
all callers have pure-Python fallbacks, so absence is never fatal."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "wheeledlab_native.cpp")
_LIB_PATH = os.path.join(_DIR, "libwheeledlab_native.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    for cc in ("c++", "g++", "clang++"):
        try:
            subprocess.run(
                [cc, "-O2", "-shared", "-fPIC", "-std=c++17",
                 "-o", _LIB_PATH, _SRC],
                check=True, capture_output=True, timeout=120)
            return True
        except (FileNotFoundError, subprocess.CalledProcessError,
                subprocess.TimeoutExpired):
            continue
    return False


def load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.wl_generate_traversability_map.argtypes = [
        ctypes.c_uint64] + [ctypes.c_int64] * 7 + [
        ctypes.POINTER(ctypes.c_uint8)]
    lib.wl_rasterize_trajectories.argtypes = [
        ctypes.c_int64] * 4 + [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8)]
    _lib = lib
    return _lib


def available() -> bool:
    return load() is not None


def generate_traversability_map(seed: int, map_size, env_size,
                                sub_group_size, num_walkers: int
                                ) -> Optional[np.ndarray]:
    """Native map generation; returns None if the library is unavailable.
    Deterministic in `seed` (its own SplitMix64 stream — a different but
    equally valid sample from the same map distribution as the numpy path)."""
    lib = load()
    if lib is None:
        return None
    rows, cols = map_size
    grid = np.zeros((rows, cols), dtype=np.uint8)
    lib.wl_generate_traversability_map(
        ctypes.c_uint64(seed), rows, cols, env_size[0], env_size[1],
        sub_group_size[0], sub_group_size[1], num_walkers,
        grid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return grid.astype(bool)


def rasterize_trajectories(frames: np.ndarray, positions_px: np.ndarray,
                           yaws: Optional[np.ndarray],
                           colors: np.ndarray, trail: int) -> bool:
    """In-place draw onto background-filled frames. Returns False when the
    native library is unavailable (caller falls back to Python)."""
    lib = load()
    if lib is None:
        return False
    T, size = frames.shape[0], frames.shape[1]
    B = positions_px.shape[1]
    pos = np.ascontiguousarray(positions_px, dtype=np.float32)
    yaw_ptr = None
    if yaws is not None:
        yaws = np.ascontiguousarray(yaws, dtype=np.float32)
        yaw_ptr = yaws.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    colors = np.ascontiguousarray(colors, dtype=np.uint8)
    lib.wl_rasterize_trajectories(
        T, B, size, trail,
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        yaw_ptr, colors.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return True
