"""Image pre/post-processing for serving.

Equivalent of the reference ``PreProcessor`` / ``PostProcessor``
(``src/export/android_pipeline.py:56-188``): aspect-preserving resize +
zero-pad to S×S (or plain resize), normalize to [-1, 1]; inverse on the way
out (denormalize, clip, un-pad, resize back to the original size).

Layout is NHWC throughout (the reference converts to CHW for its runtimes;
TPU wants channels-last).  cv2 does the host-side resizes, matching the
reference's backend.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


@dataclass
class PreprocessMeta:
    """Metadata needed to invert preprocessing
    (``android_pipeline.py:123-138``)."""
    original_size: Tuple[int, int]          # (h, w)
    # (scale_h, scale_w): identical when keep_aspect, independent per axis
    # for the anisotropic plain-resize mode.
    scale: Tuple[float, float]
    pad: Tuple[int, int, int, int]          # top, bottom, left, right
    keep_aspect: bool


class PreProcessor:
    """uint8 HWC image → float32 [1, S, S, 3] in [-1, 1] + metadata.

    With ``normalize=False`` the resized/padded canvas is returned as
    uint8 [1, S, S, 3] and the /127.5−1 is left to the caller — the
    serving pipeline does it ON DEVICE so the host→device transfer moves
    1 B/px instead of 4 (same f32 arithmetic, bit-identical).
    """

    def __init__(self, target_size: int = 256, keep_aspect: bool = True,
                 normalize: bool = True):
        self.target_size = target_size
        self.keep_aspect = keep_aspect
        self.normalize = normalize

    def __call__(self, image_u8: np.ndarray
                 ) -> Tuple[np.ndarray, PreprocessMeta]:
        if cv2 is None:
            raise RuntimeError("cv2 required for serving preprocessing")
        h, w = image_u8.shape[:2]
        s = self.target_size
        if self.keep_aspect:
            scale = s / max(h, w)
            nh, nw = int(round(h * scale)), int(round(w * scale))
            resized = cv2.resize(image_u8, (nw, nh),
                                 interpolation=cv2.INTER_LINEAR)
            pad_top = (s - nh) // 2
            pad_bottom = s - nh - pad_top
            pad_left = (s - nw) // 2
            pad_right = s - nw - pad_left
            canvas = np.zeros((s, s, 3), dtype=np.uint8)
            canvas[pad_top:pad_top + nh, pad_left:pad_left + nw] = resized
            meta = PreprocessMeta((h, w), (scale, scale),
                                  (pad_top, pad_bottom, pad_left, pad_right),
                                  True)
        else:
            canvas = cv2.resize(image_u8, (s, s),
                                interpolation=cv2.INTER_LINEAR)
            meta = PreprocessMeta((h, w), (s / h, s / w), (0, 0, 0, 0), False)

        if not self.normalize:
            return canvas[None], meta
        # /127.5 − 1 (``android_pipeline.py:118``)
        arr = canvas.astype(np.float32) / 127.5 - 1.0
        return arr[None], meta


class PostProcessor:
    """float [1, S, S, 3] in [-1, 1] → uint8 HWC at the original size."""

    def __call__(self, output: np.ndarray, meta: PreprocessMeta) -> np.ndarray:
        if cv2 is None:
            raise RuntimeError("cv2 required for serving postprocessing")
        img = np.asarray(output)[0]
        if img.dtype != np.uint8:
            # ·127.5 + 127.5, clip (``android_pipeline.py:160-163``).
            # uint8 inputs already had this applied ON DEVICE (the serving
            # sampler emits uint8 to quarter the device→host bytes).
            img = np.clip(img * 127.5 + 127.5, 0, 255).astype(np.uint8)
        if meta.keep_aspect:
            top, bottom, left, right = meta.pad
            img = img[top:img.shape[0] - bottom,
                      left:img.shape[1] - right]
        h, w = meta.original_size
        return cv2.resize(img, (w, h), interpolation=cv2.INTER_LINEAR)
