"""ctypes binding + on-demand build of the native scene-shard loader (loader.cpp).

The .s3z shard format + multithreaded zstd decode replaces the reference's
process-pool DataLoader host pipeline (SURVEY.md §2.10). Gracefully degrades: if g++
or libzstd is unavailable, `available()` returns False and callers fall back to the
npz path in data/scene_io.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_HERE = Path(__file__).parent
_SO = _HERE / "_loader.so"
_LIB = None


def _build() -> bool:
    src = _HERE / "loader.cpp"
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        str(src), "-lzstd", "-o", str(_SO),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except Exception:
        return False


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    if not _SO.exists() or _SO.stat().st_mtime < (_HERE / "loader.cpp").stat().st_mtime:
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError:
        return None
    lib.s3_open.restype = ctypes.c_void_p
    lib.s3_open.argtypes = [ctypes.c_char_p]
    lib.s3_close.argtypes = [ctypes.c_void_p]
    lib.s3_info.argtypes = [ctypes.c_void_p] + [
        ctypes.POINTER(ctypes.c_uint32)
    ] * 3
    lib.s3_poses.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.s3_decode_frames.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32,
    ]
    lib.s3_decode_frames.restype = ctypes.c_int32
    lib.s3_zstd_compress.restype = ctypes.c_int64
    lib.s3_zstd_compress.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_int,
    ]
    lib.s3_zstd_bound.restype = ctypes.c_int64
    lib.s3_zstd_bound.argtypes = [ctypes.c_int64]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def _compress(lib, arr: np.ndarray, level: int = 3) -> bytes:
    raw = np.ascontiguousarray(arr).tobytes()
    cap = lib.s3_zstd_bound(len(raw))
    dst = ctypes.create_string_buffer(cap)
    got = lib.s3_zstd_compress(raw, len(raw), dst, cap, level)
    if got < 0:
        raise RuntimeError("zstd compression failed")
    return dst.raw[:got]


def write_shard(path, rgb_u8: np.ndarray, depth_mm_u16: np.ndarray,
                poses: np.ndarray, level: int = 3) -> None:
    """rgb [n, h, w, 3] u8; depth [n, h, w] u16; poses [n, 4, 4] f32."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    n, h, w, _ = rgb_u8.shape
    rgb_blocks = [_compress(lib, rgb_u8[i], level) for i in range(n)]
    dep_blocks = [_compress(lib, depth_mm_u16[i], level) for i in range(n)]
    rgb_off, dep_off = [], []
    pos = 0
    for blk in rgb_blocks:
        rgb_off.append(pos)
        pos += len(blk)
    for blk in dep_blocks:
        dep_off.append(pos)
        pos += len(blk)
    header = b"S3Z1"
    header += np.asarray([n, h, w], np.uint32).tobytes()
    header += np.asarray(poses, np.float32).tobytes()
    header += np.asarray(rgb_off, np.uint64).tobytes()
    header += np.asarray([len(b) for b in rgb_blocks], np.uint64).tobytes()
    header += np.asarray(dep_off, np.uint64).tobytes()
    header += np.asarray([len(b) for b in dep_blocks], np.uint64).tobytes()
    with open(path, "wb") as f:
        f.write(header)
        for blk in rgb_blocks:
            f.write(blk)
        for blk in dep_blocks:
            f.write(blk)


class Shard:
    """Reader over one .s3z scene shard with multithreaded decode."""

    def __init__(self, path, n_threads: int | None = None):
        lib = _load()
        if lib is None:
            raise RuntimeError("native loader unavailable")
        self.lib = lib
        self.handle = lib.s3_open(str(path).encode())
        if not self.handle:
            raise IOError(f"failed to open shard {path}")
        n = ctypes.c_uint32()
        h = ctypes.c_uint32()
        w = ctypes.c_uint32()
        lib.s3_info(self.handle, ctypes.byref(n), ctypes.byref(h),
                    ctypes.byref(w))
        self.n_frames, self.h, self.w = n.value, h.value, w.value
        self.n_threads = n_threads or min(os.cpu_count() or 1, 8)

    def poses(self) -> np.ndarray:
        out = np.empty((self.n_frames, 4, 4), np.float32)
        self.lib.s3_poses(self.handle, out.ctypes.data_as(ctypes.c_void_p))
        return out

    def decode(self, indices, with_depth: bool = True):
        idx = np.ascontiguousarray(indices, np.int32)
        n = len(idx)
        rgb = np.empty((n, self.h, self.w, 3), np.uint8)
        depth = np.empty((n, self.h, self.w), np.uint16) if with_depth else None
        rc = self.lib.s3_decode_frames(
            self.handle,
            idx.ctypes.data_as(ctypes.c_void_p), n,
            rgb.ctypes.data_as(ctypes.c_void_p),
            depth.ctypes.data_as(ctypes.c_void_p) if with_depth else None,
            self.n_threads,
        )
        if rc != 0:
            raise RuntimeError(f"shard decode failed (code {rc})")
        return rgb, depth

    def close(self):
        if self.handle:
            self.lib.s3_close(self.handle)
            self.handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
