"""Python side of the packed tile store: writer, ctypes binding, fallback.

Format documented in tilestore.cpp. Usage:

  pack_tiles(dataset, "train.msts")              # one-time ETL
  store = PackedTileStore("train.msts")
  batch = store.gather(indices)                  # [n, C, H, W] float32
  crops = store.gather_crop(indices, xs, ys, 8)  # [n, C, 8, 8]
  labels = store.gather_labels(indices)          # [n, H, W] int32
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess
import tempfile
from typing import Optional, Sequence

import numpy as np

_MAGIC = 0x5354534D  # "MSTS"
_HEADER = struct.Struct("<8I")
_LIB = None
_LIB_TRIED = False


def _build_library() -> Optional[str]:
    src = os.path.join(os.path.dirname(__file__), "tilestore.cpp")
    out = os.path.join(os.path.dirname(__file__), "_tilestore.so")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    # compile to a per-process temp name and os.replace: concurrent first
    # builds (multi-host workers) must not interleave writes into the same
    # .so — a corrupt file with a fresh mtime would be trusted forever
    tmp = f"{out}.{os.getpid()}.tmp"
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        src, "-o", tmp,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, out)
        return out
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        if os.path.exists(tmp):
            try:
                os.unlink(tmp)
            except OSError:
                pass
        return None


def _load_library():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    path = _build_library()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.ts_open.restype = ctypes.c_void_p
    lib.ts_open.argtypes = [ctypes.c_char_p]
    lib.ts_close.argtypes = [ctypes.c_void_p]
    lib.ts_info.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint32)]
    lib.ts_gather.restype = ctypes.c_int
    lib.ts_gather.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
    ]
    lib.ts_gather_crop.restype = ctypes.c_int
    lib.ts_gather_crop.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_int32, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
    ]
    lib.ts_gather_labels.restype = ctypes.c_int
    lib.ts_gather_labels.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int,
    ]
    _LIB = lib
    return _LIB


def native_available() -> bool:
    return _load_library() is not None


def pack_tiles(dataset, path: str, with_labels: Optional[bool] = None) -> None:
    """Write a map-style dataset of {'img': [C,H,W] f32, 'label': [H,W]}
    samples into the packed format (tmp file + atomic rename)."""
    n = len(dataset)
    first = dataset[0]
    img0 = np.asarray(first["img"], np.float32)
    c, h, w = img0.shape
    if with_labels is None:
        with_labels = "label" in first and np.ndim(first["label"]) == 2
    flags = 1 if with_labels else 0

    dirname = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(dirname, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=dirname, suffix=".msts.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(_HEADER.pack(_MAGIC, 1, n, c, h, w, flags, 0))
            # ONE dataset pass: labels are tiny (H*W i32) — buffer them
            # during the image pass instead of decoding every sample twice
            labels = [] if with_labels else None
            for i in range(n):
                sample = dataset[i]
                img = np.ascontiguousarray(np.asarray(sample["img"], np.float32))
                assert img.shape == (c, h, w), f"tile {i} shape {img.shape}"
                f.write(img.tobytes())
                if with_labels:
                    lab = np.ascontiguousarray(np.asarray(sample["label"], np.int32))
                    assert lab.shape == (h, w)
                    labels.append(lab)
            if with_labels:
                for lab in labels:
                    f.write(lab.tobytes())
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


class PackedTileStore:
    """Memory-mapped reader with native parallel gathers (numpy fallback).

    Also usable directly as a map-style dataset: ``store[i]`` →
    ``{"img": ..., "label": ...}``, so it plugs into DataLoader/split_dataset/
    DeviceTileStore unchanged.
    """

    def __init__(self, path: str, threads: int = 8, standardize: Optional[tuple] = None):
        self.path = path
        self.threads = threads
        self._mean = None
        self._std = None
        if standardize is not None:
            self._mean = np.ascontiguousarray(standardize[0], np.float32)
            self._std = np.ascontiguousarray(standardize[1], np.float32)

        self._lib = _load_library()
        self._handle = None
        if self._lib is not None:
            handle = self._lib.ts_open(path.encode())
            if handle:
                self._handle = ctypes.c_void_p(handle)
        # numpy fallback / metadata
        with open(path, "rb") as f:
            header = _HEADER.unpack(f.read(_HEADER.size))
        magic, version, n, c, h, w, flags, _ = header
        assert magic == _MAGIC and version == 1, f"bad store file {path}"
        self.num_tiles, self.bands, self.height, self.width = n, c, h, w
        self.has_labels = bool(flags & 1)
        data_bytes = 4 * n * c * h * w
        self._mm_img = np.memmap(
            path, np.float32, mode="r", offset=_HEADER.size, shape=(n, c, h, w)
        )
        self._mm_lab = (
            np.memmap(
                path, np.int32, mode="r", offset=_HEADER.size + data_bytes, shape=(n, h, w)
            )
            if self.has_labels
            else None
        )

    # --- gathers -------------------------------------------------------------
    def _check_bounds(self, idx, xs=None, ys=None, size=None):
        """Validate BEFORE either path: the numpy fallback's wraparound
        indexing would silently return wrong tiles for the same inputs the
        native code rejects."""
        if idx.size and (int(idx.min()) < 0 or int(idx.max()) >= self.num_tiles):
            raise IndexError(
                f"tile index out of range [0, {self.num_tiles}): "
                f"[{int(idx.min())}, {int(idx.max())}]"
            )
        if xs is not None and xs.size and (
            int(xs.min()) < 0 or int(xs.max()) + size > self.height
        ):
            raise IndexError(f"crop x out of range for size {size}")
        if ys is not None and ys.size and (
            int(ys.min()) < 0 or int(ys.max()) + size > self.width
        ):
            raise IndexError(f"crop y out of range for size {size}")

    def gather(self, indices: Sequence[int]) -> np.ndarray:
        idx = np.ascontiguousarray(indices, np.int32)
        self._check_bounds(idx)
        out = np.empty((len(idx), self.bands, self.height, self.width), np.float32)
        if self._handle is not None:
            rc = self._lib.ts_gather(
                self._handle,
                idx.ctypes.data_as(ctypes.c_void_p), len(idx),
                out.ctypes.data_as(ctypes.c_void_p),
                _ptr(self._mean), _ptr(self._std), self.threads,
            )
            if rc != 0:  # inputs are pre-validated: nonzero is a real fault
                raise RuntimeError(f"ts_gather failed (rc={rc})")
            return out
        out[:] = self._mm_img[idx]
        if self._mean is not None:
            out -= self._mean[:, None, None]
            out /= self._std[:, None, None]
        return out

    def gather_crop(self, indices, xs, ys, size: int) -> np.ndarray:
        idx = np.ascontiguousarray(indices, np.int32)
        xs = np.ascontiguousarray(xs, np.int32)
        ys = np.ascontiguousarray(ys, np.int32)
        self._check_bounds(idx, xs, ys, size)
        out = np.empty((len(idx), self.bands, size, size), np.float32)
        if self._handle is not None:
            rc = self._lib.ts_gather_crop(
                self._handle,
                idx.ctypes.data_as(ctypes.c_void_p),
                xs.ctypes.data_as(ctypes.c_void_p),
                ys.ctypes.data_as(ctypes.c_void_p),
                len(idx), size,
                out.ctypes.data_as(ctypes.c_void_p),
                _ptr(self._mean), _ptr(self._std), self.threads,
            )
            if rc != 0:
                raise RuntimeError(f"ts_gather_crop failed (rc={rc})")
            return out
        for i, (t, x, y) in enumerate(zip(idx, xs, ys)):
            out[i] = self._mm_img[t, :, x : x + size, y : y + size]
        if self._mean is not None:
            out -= self._mean[:, None, None]
            out /= self._std[:, None, None]
        return out

    def gather_labels(self, indices) -> np.ndarray:
        assert self.has_labels, "store has no labels"
        idx = np.ascontiguousarray(indices, np.int32)
        self._check_bounds(idx)
        out = np.empty((len(idx), self.height, self.width), np.int32)
        if self._handle is not None:
            rc = self._lib.ts_gather_labels(
                self._handle, idx.ctypes.data_as(ctypes.c_void_p), len(idx),
                out.ctypes.data_as(ctypes.c_void_p), self.threads,
            )
            if rc != 0:
                raise RuntimeError(f"ts_gather_labels failed (rc={rc})")
            return out
        out[:] = self._mm_lab[idx]
        return out

    # --- map-style dataset interface ------------------------------------------
    def __len__(self) -> int:
        return self.num_tiles

    def __getitem__(self, i: int) -> dict:
        sample = {"img": self.gather([i])[0]}
        if self.has_labels:
            sample["label"] = self.gather_labels([i])[0].astype(np.int64)
        return sample

    def close(self) -> None:
        if self._handle is not None and self._lib is not None:
            self._lib.ts_close(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


def _ptr(arr: Optional[np.ndarray]):
    if arr is None:
        return None
    return arr.ctypes.data_as(ctypes.c_void_p)
