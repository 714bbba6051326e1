"""GrayStore: decode-once grayscale frame store (C++ backed, ctypes).

The TPU-native answer to the reference's NVDEC hot path: videos are
transcoded once into a raw uint8 store (``.gray`` file, mmap-able); training
and inference then fetch strided clips at page-cache memcpy speed through
``native/gray_store.cpp``'s threaded gather. Falls back to a pure-numpy
reader when the shared library hasn't been built.

Build: ``make -C native`` (or ``GrayStoreLib.build()``).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

from ball_action_spotting_tpu.data.video import FrameSource

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libgray_store.so"

_HEADER = 24
_MAGIC = b"GRAYSTR1"


class GrayStoreLib:
    _lib: Optional[ctypes.CDLL] = None

    @classmethod
    def build(cls) -> None:
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                       capture_output=True)

    @classmethod
    def get(cls, build_if_missing: bool = True) -> Optional[ctypes.CDLL]:
        if cls._lib is not None:
            return cls._lib
        if not _LIB_PATH.exists() and build_if_missing:
            try:
                cls.build()
            except Exception:
                return None
        if not _LIB_PATH.exists():
            return None
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.gray_store_open.argtypes = [ctypes.c_char_p,
                                        ctypes.POINTER(ctypes.c_void_p)]
        lib.gray_store_info.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint64),
        ]
        lib.gray_store_read.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.gray_store_gather.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ]
        lib.gray_store_close.argtypes = [ctypes.c_void_p]
        cls._lib = lib
        return lib


def write_gray_store(path: Path, frames_iter, height: int, width: int,
                     frame_count: int) -> None:
    """Transcode an iterable of (H, W) uint8 frames into a store file."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(np.uint32(height).tobytes())
        f.write(np.uint32(width).tobytes())
        f.write(np.uint64(frame_count).tobytes())
        written = 0
        for frame in frames_iter:
            frame = np.ascontiguousarray(frame, dtype=np.uint8)
            assert frame.shape == (height, width), frame.shape
            f.write(frame.tobytes())
            written += 1
        assert written == frame_count, (written, frame_count)


def transcode_video_to_store(video_path: Path, store_path: Path) -> dict:
    """Decode a video once (OpenCV/FFmpeg) → grayscale store. Returns info."""
    from ball_action_spotting_tpu.data.video import OpenCVSource

    src = OpenCVSource(str(video_path))
    try:
        info = dict(height=src.height, width=src.width,
                    frame_count=src.num_frames, fps=src.fps)
        def frames():
            for _ in range(src.num_frames):
                yield src.fetch_frame()
        write_gray_store(store_path, frames(), src.height, src.width, src.num_frames)
    finally:
        src.close()
    return info


class GrayStore:
    """Reader over one store file (native if available, numpy fallback)."""

    def __init__(self, path: Path, num_threads: int = 4):
        self.path = Path(path)
        self.num_threads = num_threads
        self._lib = GrayStoreLib.get()
        self._handle = None
        if self._lib is not None:
            handle = ctypes.c_void_p()
            rc = self._lib.gray_store_open(str(self.path).encode(),
                                           ctypes.byref(handle))
            if rc != 0:
                raise OSError(f"gray_store_open failed rc={rc}: {self.path}")
            self._handle = handle
            h = ctypes.c_uint32()
            w = ctypes.c_uint32()
            n = ctypes.c_uint64()
            self._lib.gray_store_info(handle, ctypes.byref(h), ctypes.byref(w),
                                      ctypes.byref(n))
            self.height, self.width, self.frame_count = h.value, w.value, n.value
        else:  # numpy fallback
            with open(self.path, "rb") as f:
                head = f.read(_HEADER)
            assert head[:8] == _MAGIC, "not a gray store"
            self.height = int(np.frombuffer(head[8:12], np.uint32)[0])
            self.width = int(np.frombuffer(head[12:16], np.uint32)[0])
            self.frame_count = int(np.frombuffer(head[16:24], np.uint64)[0])
            self._mmap = np.memmap(self.path, dtype=np.uint8, mode="r",
                                   offset=_HEADER,
                                   shape=(self.frame_count, self.height, self.width))

    def read(self, start: int, count: int) -> np.ndarray:
        out = np.empty((count, self.height, self.width), dtype=np.uint8)
        if self._handle is not None:
            rc = self._lib.gray_store_read(
                self._handle, start, count,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            )
            if rc != 0:
                raise IndexError(f"gray_store_read rc={rc}")
        else:
            out[:] = self._mmap[start : start + count]
        return out

    def gather(self, clip_indexes: np.ndarray,
               out: Optional[np.ndarray] = None) -> np.ndarray:
        """(num_clips, frames_per_clip) int64 indexes → uint8 clips
        (num_clips, frames_per_clip, H, W); out-of-range clamped.
        ``out`` lets callers assemble directly into a preallocated (pooled)
        buffer — allocation page faults dominate at clip sizes."""
        clip_indexes = np.ascontiguousarray(clip_indexes, dtype=np.int64)
        nc, fpc = clip_indexes.shape
        if out is None:
            out = np.empty((nc, fpc, self.height, self.width), dtype=np.uint8)
        assert out.shape == (nc, fpc, self.height, self.width) and out.dtype == np.uint8
        assert out.flags.c_contiguous
        if self._handle is not None:
            rc = self._lib.gray_store_gather(
                self._handle,
                clip_indexes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                nc, fpc,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                self.num_threads,
            )
            if rc != 0:
                raise RuntimeError(f"gray_store_gather rc={rc}")
        else:
            clamped = np.clip(clip_indexes, 0, self.frame_count - 1)
            for i in range(nc):
                out[i] = self._mmap[clamped[i]]
        return out

    def close(self) -> None:
        if self._handle is not None:
            self._lib.gray_store_close(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


class GrayStoreSource(FrameSource):
    """FrameSource over a store — plugs into datasets/predictors unchanged."""

    def __init__(self, store_path: Path, num_threads: int = 4):
        super().__init__(str(store_path))
        self.store = GrayStore(store_path, num_threads=num_threads)
        self.num_frames = self.store.frame_count
        self.height = self.store.height
        self.width = self.store.width

    def _next_decode(self) -> np.ndarray:
        return self.store.read(self.current_index, 1)[0]

    def _seek_and_read(self, index: int) -> np.ndarray:
        return self.store.read(index, 1)[0]

    def fetch_frames(self, indexes: Sequence[int]) -> np.ndarray:
        # random access is free: gather exactly the strided indexes instead
        # of decoding the covering range like codec-backed sources
        clip = np.asarray(indexes, dtype=np.int64)[None, :]
        return self.store.gather(clip)[0]

    def fetch_frames_into(self, indexes: Sequence[int], out: np.ndarray) -> None:
        clip = np.asarray(indexes, dtype=np.int64)[None, :]
        self.store.gather(clip, out=out[None])

    def close(self) -> None:
        self.store.close()


def store_path_for_video(video_path: str | Path) -> Path:
    return Path(str(video_path) + ".gray")
