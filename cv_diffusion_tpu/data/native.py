"""ctypes bindings for the native C++ data pipeline (``native/dataloader.cc``).

Replaces the reference's DataLoader worker subprocesses
(``src/training/dataset.py:371-378``) with a GIL-free threaded C++ library:
libpng/libjpeg decode + paired augmentation + batch assembly directly into
NumPy buffers.  Falls back to the pure-Python loader when the shared library
hasn't been built (``make -C native``).
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path
from typing import Dict, Iterator, List, Tuple

import numpy as np

_LIB = None


def _lib_paths():
    """CVDM_NATIVE_LIB (read at call time, so it can be set after import)
    takes priority over the repo's default build."""
    return [
        Path(os.environ.get("CVDM_NATIVE_LIB", "")),
        Path(__file__).resolve().parent.parent.parent / "native"
        / "libcvdm_data.so",
    ]


def _load_lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    for p in _lib_paths():
        if p and p.is_file():
            lib = ctypes.CDLL(str(p))
            lib.cvdm_version.restype = ctypes.c_int
            lib.cvdm_decode_image.restype = ctypes.c_int
            lib.cvdm_decode_image.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_long, ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int)]
            lib.cvdm_load_pair_batch.restype = ctypes.c_int
            lib.cvdm_load_pair_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int, ctypes.c_int, ctypes.c_uint64, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8)]
            lib.cvdm_load_synth_batch.restype = ctypes.c_int
            lib.cvdm_load_synth_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
                ctypes.c_uint64, ctypes.c_float, ctypes.c_float,
                ctypes.c_float, ctypes.c_float, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_uint8)]
            # cvdm_rotate_u8 added after the first shipped lib build; keep
            # loading older libraries that don't export it.
            if hasattr(lib, "cvdm_rotate_u8"):
                lib.cvdm_rotate_u8.restype = ctypes.c_int
                lib.cvdm_rotate_u8.argtypes = [
                    ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
                    ctypes.c_int, ctypes.c_double,
                    ctypes.POINTER(ctypes.c_uint8)]
            _LIB = lib
            return lib
    return None


def native_available() -> bool:
    return _load_lib() is not None


def _c_paths(paths: List[str]):
    arr = (ctypes.c_char_p * len(paths))()
    arr[:] = [str(p).encode() for p in paths]
    return arr


def decode_image(path: str) -> np.ndarray:
    """Decode a PNG/JPEG to an RGB uint8 array with the native decoder."""
    lib = _load_lib()
    if lib is None:
        raise RuntimeError("native library not built (make -C native)")
    h = ctypes.c_int()
    w = ctypes.c_int()
    cap = 32 * 1024 * 1024
    buf = np.empty((cap,), dtype=np.uint8)
    rc = lib.cvdm_decode_image(
        str(path).encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        cap, ctypes.byref(h), ctypes.byref(w))
    if rc == -2:  # buffer too small: retry exactly sized
        cap = h.value * w.value * 3
        buf = np.empty((cap,), dtype=np.uint8)
        rc = lib.cvdm_decode_image(
            str(path).encode(),
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap,
            ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        raise IOError(f"native decode failed for {path}")
    return buf[:h.value * w.value * 3].reshape(h.value, w.value, 3).copy()


def rotate_u8(img: np.ndarray, angle_deg: float) -> np.ndarray:
    """Native center rotation (bilinear, reflect-101) — exported for the
    geometry-parity test against ``augment.rotate`` (cv2.warpAffine)."""
    lib = _load_lib()
    if lib is None or not hasattr(lib, "cvdm_rotate_u8"):
        raise RuntimeError("native library (with cvdm_rotate_u8) not built")
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    dst = np.empty_like(img)
    rc = lib.cvdm_rotate_u8(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        float(angle_deg),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc != 0:
        raise ValueError(f"native rotate failed (rc={rc})")
    return dst


def load_pair_batch(low_paths: List[str], high_paths: List[str], size: int,
                    seed: int, augment: bool, num_threads: int = 0
                    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode + transform a paired batch in C++ threads.

    Returns (low [n,S,S,3] f32 in [-1,1], high, failed-mask [n] uint8).
    """
    lib = _load_lib()
    if lib is None:
        raise RuntimeError("native library not built (make -C native)")
    n = len(low_paths)
    if len(high_paths) != n:
        # hard error, not assert: under python -O a mismatch would read past
        # the C array and segfault
        raise ValueError(f"low/high path count mismatch: {n} vs "
                         f"{len(high_paths)}")
    if num_threads <= 0:
        num_threads = min(n, os.cpu_count() or 1)
    out_low = np.empty((n, size, size, 3), dtype=np.float32)
    out_high = np.empty((n, size, size, 3), dtype=np.float32)
    failed = np.zeros((n,), dtype=np.uint8)
    lib.cvdm_load_pair_batch(
        _c_paths(low_paths), _c_paths(high_paths), n, size,
        ctypes.c_uint64(seed), int(augment), num_threads,
        out_low.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_high.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        failed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out_low, out_high, failed


def load_synth_batch(paths: List[str], size: int, seed: int,
                     gamma_range=(2.0, 5.0), noise_level_range=(0.01, 0.05),
                     num_threads: int = 0
                     ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Synthetic-degradation batch in C++ threads."""
    lib = _load_lib()
    if lib is None:
        raise RuntimeError("native library not built (make -C native)")
    n = len(paths)
    if num_threads <= 0:
        num_threads = min(n, os.cpu_count() or 1)
    out_low = np.empty((n, size, size, 3), dtype=np.float32)
    out_high = np.empty((n, size, size, 3), dtype=np.float32)
    failed = np.zeros((n,), dtype=np.uint8)
    lib.cvdm_load_synth_batch(
        _c_paths(paths), n, size, ctypes.c_uint64(seed),
        gamma_range[0], gamma_range[1], noise_level_range[0],
        noise_level_range[1], num_threads,
        out_low.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_high.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        failed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out_low, out_high, failed


class _NativeEpochLoader:
    """Shared epoch scaffolding for both native loaders: per-epoch shuffle
    via ``dataset.epoch_batches``, a decorrelated per-batch native seed, and
    the failed-mask error contract. Subclasses provide the item list
    (``_items``) and the batch load (``_load_batch``)."""

    def __init__(self, batch_size: int, shuffle: bool, drop_last: bool,
                 seed: int, num_threads: int):
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_threads = num_threads
        self._rng = np.random.default_rng(seed)
        self._seed = seed
        self._epoch = 0

    def _items(self) -> List[str]:
        raise NotImplementedError

    def _load_batch(self, idxs, seed: int):
        raise NotImplementedError

    def __len__(self) -> int:
        from .dataset import num_batches

        return num_batches(len(self._items()), self.batch_size,
                           self.drop_last)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        from .dataset import epoch_batches

        self._epoch += 1
        items = self._items()
        for bi, idxs in enumerate(epoch_batches(
                len(items), self.batch_size, self._rng,
                self.shuffle, self.drop_last)):
            low, high, failed = self._load_batch(
                idxs, self._seed + self._epoch * 1_000_003 + bi)
            if failed.any():
                bad = [items[idxs[i]] for i in np.nonzero(failed)[0]]
                raise IOError(f"native loader failed on: {bad}")
            yield {
                "low_light": low,
                "normal_light": high,
                "filenames": [os.path.basename(items[i]) for i in idxs],
            }


class NativeDataLoader(_NativeEpochLoader):
    """Drop-in DataLoader backed by the C++ pipeline.

    Same iteration contract as ``data.dataset.DataLoader`` (per-epoch shuffle,
    drop_last, NHWC float32 batches); decode + augment runs GIL-free.
    """

    def __init__(self, low_paths: List[str], high_paths: List[str],
                 image_size: int, batch_size: int, shuffle: bool = False,
                 drop_last: bool = False, augment: bool = True,
                 seed: int = 0, num_threads: int = 0):
        if len(low_paths) != len(high_paths):
            raise ValueError(f"low/high path count mismatch: "
                             f"{len(low_paths)} vs {len(high_paths)}")
        super().__init__(batch_size, shuffle, drop_last, seed, num_threads)
        self.low_paths = [str(p) for p in low_paths]
        self.high_paths = [str(p) for p in high_paths]
        self.image_size = image_size
        self.augment = augment

    @classmethod
    def from_dataset_dir(cls, root: str, image_size: int, batch_size: int,
                         **kwargs) -> "NativeDataLoader":
        """Build from a LOL-style directory using the Python dataset's
        discovery logic (dir probing, sorting, truncation)."""
        from .dataset import LowLightDataset

        ds = LowLightDataset(root, image_size=image_size, augment_data=False)
        return cls([str(p) for p in ds.low_images],
                   [str(p) for p in ds.high_images],
                   image_size, batch_size, **kwargs)

    def _items(self) -> List[str]:
        return self.low_paths

    def _load_batch(self, idxs, seed: int):
        return load_pair_batch(
            [self.low_paths[i] for i in idxs],
            [self.high_paths[i] for i in idxs],
            self.image_size, seed=seed, augment=self.augment,
            num_threads=self.num_threads)


class NativeSyntheticDataLoader(_NativeEpochLoader):
    """Synthetic-degradation loader backed by ``cvdm_load_synth_batch``.

    Native counterpart of ``SyntheticLowLightDataset`` + ``DataLoader``:
    decode → crop/hflip → gamma/noise/color degradation in C++ threads.
    """

    def __init__(self, paths: List[str], image_size: int, batch_size: int,
                 shuffle: bool = False, drop_last: bool = False,
                 gamma_range=(2.0, 5.0), noise_level_range=(0.01, 0.05),
                 seed: int = 0, num_threads: int = 0):
        super().__init__(batch_size, shuffle, drop_last, seed, num_threads)
        self.paths = [str(p) for p in paths]
        self.image_size = image_size
        self.gamma_range = gamma_range
        self.noise_level_range = noise_level_range

    def _items(self) -> List[str]:
        return self.paths

    def _load_batch(self, idxs, seed: int):
        return load_synth_batch(
            [self.paths[i] for i in idxs], self.image_size, seed=seed,
            gamma_range=self.gamma_range,
            noise_level_range=self.noise_level_range,
            num_threads=self.num_threads)
