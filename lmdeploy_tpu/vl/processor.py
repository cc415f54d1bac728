"""Image loading + CLIP preprocessing + prompt expansion for VLMs.

Reference analog: ``lmdeploy/vl/utils.py`` (load_image) +
``lmdeploy/vl/model/llava_hf.py`` preprocess.  Pure numpy/PIL on the host —
pixel tensors only hit the device inside the jitted ``encode_images``.
"""
from __future__ import annotations

import base64
import io
import os
from typing import List, Sequence, Tuple

import numpy as np

# CLIP defaults (openai/clip-vit-large-patch14-336 preprocessor_config.json)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def load_image(img):
    """PIL image from: PIL.Image | np.ndarray | file path | (data-)URL-less base64
    string | raw bytes.  Remote URLs are rejected (no egress in serving hosts —
    clients send base64, matching OpenAI image_url data: URIs)."""
    from PIL import Image

    if isinstance(img, Image.Image):
        return img.convert('RGB')
    if isinstance(img, np.ndarray):
        return Image.fromarray(img).convert('RGB')
    if isinstance(img, bytes):
        return Image.open(io.BytesIO(img)).convert('RGB')
    if isinstance(img, str):
        if img.startswith('data:'):
            img = img.split(',', 1)[1]
        if os.path.exists(img):
            return Image.open(img).convert('RGB')
        if img.startswith(('http://', 'https://')):
            raise ValueError('remote image URLs are not fetched; send base64 '
                             '(data: URI) or a local path')
        return Image.open(io.BytesIO(base64.b64decode(img))).convert('RGB')
    raise TypeError(f'unsupported image type {type(img)!r}')


class ImageProcessor:
    """CLIP-style: resize shortest edge, center crop, rescale, normalize.

    Emits NHWC float32 — the tower's patchify consumes HWC directly.
    """

    def __init__(self, image_size: int = 336, mean=CLIP_MEAN, std=CLIP_STD,
                 resize_mode: str = 'crop'):
        self.image_size = image_size
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        self.resize_mode = resize_mode      # 'crop' (CLIP) | 'square' (SigLIP)

    def __call__(self, images: Sequence) -> np.ndarray:
        from PIL import Image

        S = self.image_size
        out = np.empty((len(images), S, S, 3), np.float32)
        for i, img in enumerate(images):
            img = load_image(img)
            if self.resize_mode == 'square':
                # gemma3/siglip: direct (aspect-changing) resize to S x S
                img = img.resize((S, S), Image.Resampling.BICUBIC)
            else:
                w, h = img.size
                scale = S / min(w, h)
                img = img.resize((max(S, int(round(w * scale))),
                                  max(S, int(round(h * scale)))),
                                 Image.Resampling.BICUBIC)
                w, h = img.size
                left, top = (w - S) // 2, (h - S) // 2
                img = img.crop((left, top, left + S, top + S))
            arr = np.asarray(img, np.float32) / 255.0
            out[i] = (arr - self.mean) / self.std
        return out


def expand_image_tokens(input_ids: List[int], image_token_id: int,
                        tokens_per_image, num_images: int,
                        ) -> Tuple[List[int], List[int]]:
    """Expand each image placeholder token to that image's token count.

    ``tokens_per_image``: an int (fixed-geometry towers: llava, InternVL) or a
    per-image list (native-resolution towers: qwen2-vl).  Returns
    (expanded_ids, span_offsets) where span_offsets[i] is the position in the
    expanded sequence where image i's features begin.  If the prompt contains
    no placeholders, image blocks are prepended (reference behavior for plain
    string prompts to a VLM).
    """
    counts = ([tokens_per_image] * num_images
              if isinstance(tokens_per_image, int) else list(tokens_per_image))
    n_found = sum(1 for t in input_ids if t == image_token_id)
    if n_found == 0 and num_images:
        block: List[int] = []
        offsets = []
        for c in counts:
            offsets.append(len(block))
            block.extend([image_token_id] * c)
        return block + list(input_ids), offsets
    if n_found != num_images:
        raise ValueError(f'prompt has {n_found} image placeholders but '
                         f'{num_images} images were supplied')
    out: List[int] = []
    offsets: List[int] = []
    img = 0
    for t in input_ids:
        if t == image_token_id:
            offsets.append(len(out))
            out.extend([image_token_id] * counts[img])
            img += 1
        else:
            out.append(t)
    return out, offsets
