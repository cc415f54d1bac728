"""Qwen2-VL native-resolution image preprocessing (host numpy).

Reference analog: the HF ``Qwen2VLImageProcessor`` behavior that
``lmdeploy/vl/model/qwen2.py`` delegates to: smart-resize to multiples of
``patch * merge`` under a pixel budget, CLIP normalization, then unfold into
``[n_patches, C * temporal_patch * P * P]`` rows in merge-block raster order
(the order the tower's rope/window metadata and the LM's mrope ids assume).
"""
from __future__ import annotations

import math
from typing import Tuple

import numpy as np

from .processor import CLIP_MEAN, CLIP_STD, load_image


def smart_resize(h: int, w: int, factor: int = 28,
                 min_pixels: int = 56 * 56,
                 max_pixels: int = 14 * 14 * 4 * 1280) -> Tuple[int, int]:
    """Round (h, w) to multiples of ``factor`` keeping aspect ratio within the
    pixel budget (HF qwen2-vl smart_resize)."""
    if max(h, w) / min(h, w) > 200:
        raise ValueError(f'absolute aspect ratio must be < 200, got {h}x{w}')
    hb = max(factor, round(h / factor) * factor)
    wb = max(factor, round(w / factor) * factor)
    if hb * wb > max_pixels:
        beta = math.sqrt((h * w) / max_pixels)
        hb = max(factor, math.floor(h / beta / factor) * factor)
        wb = max(factor, math.floor(w / beta / factor) * factor)
    elif hb * wb < min_pixels:
        beta = math.sqrt(min_pixels / (h * w))
        hb = math.ceil(h * beta / factor) * factor
        wb = math.ceil(w * beta / factor) * factor
    return hb, wb


class QwenVLImageProcessor:
    """image -> (patch rows [n, C*tp*P*P] f32, grid (t, gh, gw))."""

    def __init__(self, patch_size: int = 14, merge_size: int = 2,
                 temporal_patch: int = 2, min_pixels: int = 56 * 56,
                 max_pixels: int = 14 * 14 * 4 * 1280,
                 mean=CLIP_MEAN, std=CLIP_STD):
        self.patch = patch_size
        self.merge = merge_size
        self.tp = temporal_patch
        self.min_pixels = min_pixels
        self.max_pixels = max_pixels
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)

    def __call__(self, img) -> Tuple[np.ndarray, Tuple[int, int, int]]:
        from PIL import Image

        img = load_image(img)
        w, h = img.size
        hb, wb = smart_resize(h, w, self.patch * self.merge,
                              self.min_pixels, self.max_pixels)
        if (wb, hb) != (w, h):
            img = img.resize((wb, hb), Image.Resampling.BICUBIC)
        arr = np.asarray(img, np.float32) / 255.0
        arr = (arr - self.mean) / self.std                       # [H, W, C]
        arr = np.transpose(arr, (2, 0, 1))                       # [C, H, W]
        # single image: repeat the frame to fill the temporal patch
        arr = np.broadcast_to(arr[None], (self.tp,) + arr.shape)  # [tp, C, H, W]
        P, m, C = self.patch, self.merge, arr.shape[1]
        gh, gw = hb // P, wb // P
        grid = (1, gh, gw)
        # unfold in (h-block, w-block, i, j) merge-raster order with feature
        # layout (C, tp, P, P) — matches the conv3d weight flattening
        x = arr.reshape(self.tp, C, gh // m, m, P, gw // m, m, P)
        x = np.transpose(x, (2, 5, 3, 6, 1, 0, 4, 7))
        x = x.reshape(gh * gw, C * self.tp * P * P)
        return np.ascontiguousarray(x), grid
