"""Device-resident dataset cache: decode once, upload once, augment on device.

The host pipelines (``data/dataset.py`` Python, ``native/dataloader.cc`` C++)
re-decode and re-augment every image every epoch and ship f32 crops to the
device every step.  That is the right shape for datasets too big for HBM, but
for LOL-scale training sets (hundreds to a few thousand frames — the
reference's whole problem domain, ``src/training/dataset.py:25-241``) it makes
training *input-bound* whenever the host is slow relative to the chip: a
measured small@256 b32 run on a 1-core host spent ~0.4 s/step on device and
3-8 s/step waiting on decode + the f32 batch upload.

This loader is the TPU-native alternative for datasets that fit in HBM:

* every frame is decoded ONCE on the host (native C++ decoder when built,
  PIL otherwise) into a uint8 ``[N, H, W, 3]`` block;
* the block is uploaded ONCE per run (uint8 = 4x fewer bytes than f32);
* each step, batch assembly runs INSIDE one jitted program on device:
  gather by indices -> normalize (exactly ``augment.normalize``'s
  u8/127.5 - 1) -> paired random crop / flips / rotation
  (``device_augment.paired_augment``) or synthetic degradation
  (``device_augment.synthetic_low_light``).

Host work per step collapses to producing a [B] index vector and a seed;
per-step host->device traffic collapses to those few bytes.  Iteration
semantics (per-epoch shuffle via ``dataset.epoch_batches``, drop_last,
decorrelated per-batch seeds) match the host and native loaders.

Uniform frame sizes are required (true of LOL/LOL-v2 and the synthetic
sets); mixed-size datasets must keep a host loader.  In mesh runs the cache
lives on the default device and ``shard_batch`` redistributes each assembled
batch over ICI; multi-host runs shard the file list per process first, so
each process caches only its shard.
"""

from __future__ import annotations

import functools
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import device_augment
from .dataset import epoch_batches, num_batches


def load_frames(paths: Sequence[str]) -> np.ndarray:
    """Decode ``paths`` to one uint8 ``[N, H, W, 3]`` block (host memory).

    Uses the native C++ decoder when built, PIL otherwise.  Raises if the
    frames disagree about H/W — a device cache needs one static shape.
    """
    from .native import decode_image, native_available

    if not paths:
        raise ValueError("no frames to cache")
    use_native = native_available()
    frames: List[np.ndarray] = []
    for p in paths:
        if use_native and Path(p).suffix.lower() in (".png", ".jpg", ".jpeg"):
            img = decode_image(str(p))
        else:
            from PIL import Image

            img = np.array(Image.open(p).convert("RGB"))
        if frames and img.shape != frames[0].shape:
            raise ValueError(
                f"device cache needs uniform frame sizes: {paths[0]} is "
                f"{frames[0].shape}, {p} is {img.shape}; use a host loader "
                f"for mixed-size datasets")
        frames.append(img)
    return np.stack(frames)


@functools.partial(jax.jit, static_argnames=("size", "augment"))
def _assemble_pair(low_frames: jnp.ndarray, high_frames: jnp.ndarray,
                   idxs: jnp.ndarray, seed: jnp.ndarray, size: int,
                   augment: bool) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gather + normalize + (augment | center-crop) for a paired batch."""
    low = jnp.take(low_frames, idxs, axis=0).astype(jnp.float32) / 127.5 - 1.0
    high = (jnp.take(high_frames, idxs, axis=0).astype(jnp.float32) / 127.5
            - 1.0)
    if augment:
        return device_augment.paired_augment(jax.random.key(seed), low, high,
                                             size)
    return device_augment.paired_center_crop(low, high, size)


@functools.partial(jax.jit, static_argnames=("size", "augment", "gamma_range",
                                             "noise_level_range"))
def _assemble_synth(frames: jnp.ndarray, idxs: jnp.ndarray, seed: jnp.ndarray,
                    size: int, augment: bool,
                    gamma_range: Tuple[float, float],
                    noise_level_range: Tuple[float, float]
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Synthetic split: crop+hflip the normal frames (the host base
    transform, ``src/training/dataset.py:276-279``), then degrade on device.
    Crop/flip are value-preserving, so normalize-then-crop equals the host's
    crop-then-normalize; the degradation bakes in the same uint8
    quantization as the host/C++ paths (``device_augment.py:141-147``)."""
    k_geo, k_deg = jax.random.split(jax.random.key(seed))
    normal = jnp.take(frames, idxs, axis=0).astype(jnp.float32) / 127.5 - 1.0
    if augment:
        normal, _ = device_augment.paired_augment(
            k_geo, normal, normal, size, hflip_p=0.5, vflip_p=0.0,
            rotate_p=0.0)
    else:
        normal, _ = device_augment.paired_center_crop(normal, normal, size)
    low = device_augment.synthetic_low_light(
        k_deg, normal, gamma_range=gamma_range,
        noise_level_range=noise_level_range)
    return low, normal


class DeviceCacheLoader:
    """Drop-in DataLoader whose batches are assembled on device.

    Yields ``{"low_light", "normal_light", "filenames"}`` like every other
    loader, but the arrays are device-resident outputs of one jitted
    gather/normalize/augment program over the cached uint8 frames.

    Paired mode: ``low_paths`` + ``high_paths`` (index-aligned).
    Synthetic mode (``high_paths=None``): ``low_paths`` are NORMAL-light
    frames; low-light inputs are degraded on device per batch.
    """

    def __init__(self, low_paths: Sequence[str],
                 high_paths: Optional[Sequence[str]],
                 image_size: int, batch_size: int, shuffle: bool = False,
                 drop_last: bool = False, augment: bool = True,
                 gamma_range: Tuple[float, float] = (2.0, 5.0),
                 noise_level_range: Tuple[float, float] = (0.01, 0.05),
                 seed: int = 0):
        self.synthetic = high_paths is None
        if not self.synthetic and len(low_paths) != len(high_paths):
            raise ValueError(f"low/high path count mismatch: "
                             f"{len(low_paths)} vs {len(high_paths)}")
        self.paths = [str(p) for p in low_paths]
        self.image_size = image_size
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.augment = augment
        self.gamma_range = tuple(gamma_range)
        self.noise_level_range = tuple(noise_level_range)
        self._rng = np.random.default_rng(seed)
        self._seed = seed
        self._epoch = 0

        # Decode on host and validate BEFORE uploading: at the axon tunnel's
        # ~9 MB/s a GB-scale cache takes minutes to ship, so every shape
        # check must fire on the host-side numpy blocks, not after
        # device_put.  uint8 keeps the upload (and HBM footprint) at 1/4 of
        # f32; normalization happens on device.
        low_np = load_frames(self.paths)
        high_np = (None if self.synthetic
                   else load_frames([str(p) for p in high_paths]))
        frame_hw = low_np.shape[1:3]
        if min(frame_hw) < image_size:
            raise ValueError(f"frames {frame_hw} smaller than crop "
                             f"{image_size}")
        # Paired crops reuse the SAME top/left offsets on both blocks
        # (paired_augment derives them from the low shape); dynamic_slice
        # would silently clamp a differently-sized high block into
        # misaligned windows, so mismatched low/high H/W must be an error.
        if high_np is not None and high_np.shape[1:3] != frame_hw:
            raise ValueError(
                f"paired device cache needs matching low/high frame sizes: "
                f"low {frame_hw}, high {high_np.shape[1:3]}; use a host "
                f"loader for mixed-resolution pairs")
        self._low = jax.device_put(low_np)
        self._high = None if high_np is None else jax.device_put(high_np)
        self._names = [Path(p).name for p in self.paths]

    def nbytes(self) -> int:
        """Device HBM held by the cache (for capacity planning)."""
        return self._low.nbytes + (0 if self._high is None
                                   else self._high.nbytes)

    def __len__(self) -> int:
        return num_batches(len(self.paths), self.batch_size, self.drop_last)

    def __iter__(self) -> Iterator[Dict[str, jnp.ndarray]]:
        self._epoch += 1
        for bi, idxs in enumerate(epoch_batches(
                len(self.paths), self.batch_size, self._rng, self.shuffle,
                self.drop_last)):
            # same decorrelation scheme as the native loaders; uint32 range
            # (jax.random.key requires a 32-bit seed)
            seed = np.uint32((self._seed + self._epoch * 1_000_003 + bi)
                             & 0xFFFFFFFF)
            idxs = np.asarray(idxs, np.int32)
            if self.synthetic:
                low, high = _assemble_synth(
                    self._low, idxs, seed, size=self.image_size,
                    augment=self.augment, gamma_range=self.gamma_range,
                    noise_level_range=self.noise_level_range)
            else:
                low, high = _assemble_pair(self._low, self._high, idxs, seed,
                                           size=self.image_size,
                                           augment=self.augment)
            yield {
                "low_light": low,
                "normal_light": high,
                "filenames": [self._names[i] for i in idxs],
            }
