"""Phi-3-Vision: CLIP ViT-L/14-336 tower + HD transform + Phi-3 LM.

Reference analog: ``lmdeploy/pytorch/models/phi3_v.py`` (Phi3ImageEmbedding:
CLIP features at layer -2, 2x2 spatial merge to 4096-d, learnable newline
separators, ``[sub | glb_GN | global]`` arrangement, 2-layer GELU projector)
over the stock Phi-3 decoder.

Host-side HD preprocessing implements the public Phi-3-V processor recipe:
transpose portrait images, grow the horizontal crop count while
``scale * ceil(scale/ratio) <= num_crops``, resize to ``scale*336`` wide,
pad the height to a 336 multiple with white, split into 336x336 crops, and
prepend a 336x336 global view.

Per-image token count: ``h_crop*12*(w_crop*12+1) + 1 + 12*13``.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from .phi3 import Phi3Model
from .vision import ClipVisionTower

# openai/clip-vit-large-patch14-336 geometry (fixed by the reference:
# phi3_v.py asserts model_name == 'openai/clip-vit-large-patch14-336')
CLIP_L_336 = {
    'hidden_size': 1024, 'num_hidden_layers': 24, 'num_attention_heads': 16,
    'intermediate_size': 4096, 'patch_size': 14, 'image_size': 336,
    'hidden_act': 'quick_gelu', 'layer_norm_eps': 1e-5,
}
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def hd_grid(w: int, h: int, num_crops: int) -> Tuple[int, int, bool]:
    """(w_crop, h_crop, transposed) for the HD transform."""
    trans = False
    if w < h:
        w, h = h, w
        trans = True
    ratio = w / h
    scale = 1
    while scale * np.ceil(scale / ratio) <= num_crops:
        scale += 1
    scale -= 1
    new_w = scale * 336
    new_h = int(new_w / ratio)
    h_crop = int(np.ceil(new_h / 336))
    return scale, h_crop, trans


def hd_preprocess(img, num_crops: int) -> Tuple[np.ndarray, Tuple[int, int]]:
    """PIL image -> (crops [1 + w_crop*h_crop, 336, 336, 3] normalized,
    (h_crop, w_crop)).  Crop 0 is the global 336x336 view."""
    from ..vl.processor import load_image
    img = load_image(img).convert('RGB')
    w, h = img.size
    w_crop, h_crop, trans = hd_grid(w, h, num_crops)
    if trans:
        img = img.transpose(2)                    # PIL.Image.ROTATE_90
        w, h = img.size
    new_w = w_crop * 336
    new_h = int(new_w * h / w)
    resized = np.asarray(img.resize((new_w, new_h)), np.float32) / 255.0
    pad = h_crop * 336 - new_h
    top = pad // 2
    canvas = np.ones((h_crop * 336, new_w, 3), np.float32)  # white padding
    canvas[top:top + new_h] = resized
    glb = np.asarray(img.resize((336, 336)), np.float32) / 255.0

    def norm(x):
        return (x - np.asarray(CLIP_MEAN)) / np.asarray(CLIP_STD)

    crops = [norm(glb)]
    for r in range(h_crop):
        for c in range(w_crop):
            crops.append(norm(canvas[r * 336:(r + 1) * 336,
                                     c * 336:(c + 1) * 336]))
    return np.stack(crops).astype(np.float32), (h_crop, w_crop)


def _merge_2x2(feats: jax.Array, h_crop: int, w_crop: int) -> jax.Array:
    """[num_crops, 24*24, C] -> [h_crop*12, w_crop*12, 4C] (reference
    reshape_hd_patches_2x2merge)."""
    N, L, C = feats.shape
    Hs = int(round(L ** 0.5))
    x = feats.reshape(N, Hs, Hs, C)
    x = x.reshape(N, Hs // 2, 2, Hs // 2, 2, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(N, Hs // 2, Hs // 2, 4 * C)
    x = x.reshape(h_crop, w_crop, Hs // 2, Hs // 2, 4 * C)
    x = x.transpose(0, 2, 1, 3, 4)
    return x.reshape(h_crop * (Hs // 2), w_crop * (Hs // 2), 4 * C)


def num_image_tokens(h_crop: int, w_crop: int, merged: int = 12) -> int:
    return (h_crop * merged * (w_crop * merged + 1) + 1
            + merged * (merged + 1))


class Phi3VModel(Phi3Model):
    """Phi-3-Vision (Phi3VForCausalLM)."""

    image_marker = '<|image_1|>'

    def _init_vision(self, config: ModelConfig):
        hf = config.hf_config or {}
        ip = hf.get('img_processor') or {}
        vis = config.vision or {}
        # testing hook: a nested vision_config overrides the fixed CLIP-L/336
        vc = vis.get('vision_config') or hf.get('vision_config') or CLIP_L_336
        self.tower = ClipVisionTower(vc, feature_layer=ip.get('layer_idx', -2),
                                     select_strategy='default')
        self.num_crops = (hf.get('embd_layer') or {}).get('num_crops') \
            or ip.get('num_crops', 16)
        self.image_dim_out = ip.get('image_dim_out', self.tower.width)
        self.image_token_index = hf.get('image_token_id')
        self._encode_jit = None

    # -- vis params -------------------------------------------------------------------
    def vis_param_shapes(self) -> Dict:
        C4 = 4 * self.tower.width
        H = self.config.hidden_size
        return {
            'tower': self.tower.param_shapes(),
            'glb_GN': (1, 1, C4),
            'sub_GN': (1, 1, 1, C4),
            'proj1_w': (C4, H), 'proj1_b': (H,),
            'proj2_w': (H, H), 'proj2_b': (H,),
        }

    def init_vis_params(self, dtype=jnp.float32):
        tower = self.tower.init_params(dtype=dtype)
        C4 = 4 * self.tower.width
        H = self.config.hidden_size
        rng = np.random.RandomState(0)

        def mk(shape):
            return jnp.asarray(rng.randn(*shape).astype(np.float32) * 0.02,
                               dtype)

        return {'tower': tower, 'glb_GN': mk((1, 1, C4)),
                'sub_GN': mk((1, 1, 1, C4)),
                'proj1_w': mk((C4, H)), 'proj1_b': jnp.zeros((H,), dtype),
                'proj2_w': mk((H, H)), 'proj2_b': jnp.zeros((H,), dtype)}

    def vis_assign_plan(self):
        """HF names: model.vision_embed_tokens.img_processor.vision_model.*
        (CLIP), .glb_GN/.sub_GN, .img_projection.{0,2}.weight/bias."""
        base = 'model.vision_embed_tokens.'
        plan = {}
        for k, v in self.tower.make_assign_plan(
                base + 'img_processor.vision_model.').items():
            plan[k] = (('tower',) + v[0], v[1], v[2])
        ident = lambda x: np.asarray(x)  # noqa: E731

        def T(x):
            return np.ascontiguousarray(np.swapaxes(np.asarray(x), -1, -2))

        plan[base + 'glb_GN'] = (('glb_GN',), ident, None)
        plan[base + 'sub_GN'] = (('sub_GN',), ident, None)
        plan[base + 'img_projection.0.weight'] = (('proj1_w',), T, None)
        plan[base + 'img_projection.0.bias'] = (('proj1_b',), ident, None)
        plan[base + 'img_projection.2.weight'] = (('proj2_w',), T, None)
        plan[base + 'img_projection.2.bias'] = (('proj2_b',), ident, None)
        return plan

    # -- encoding ---------------------------------------------------------------------
    def _hd_features(self, vis_params, feats: jax.Array, h_crop: int,
                     w_crop: int) -> jax.Array:
        """[1+n_crops, 576, C] CLIP patch features -> [T, H] projected."""
        merged = self.tower.grid // 2
        glb = _merge_2x2(feats[:1], 1, 1)                 # [12, 12, 4C]
        sub = _merge_2x2(feats[1:1 + h_crop * w_crop], h_crop, w_crop)

        def newline(x):                                   # [R, Ccols, 4C]
            R = x.shape[0]
            nl = jnp.broadcast_to(vis_params['sub_GN'][0],
                                  (R, 1, x.shape[-1]))
            return jnp.concatenate([x, nl], axis=1).reshape(
                -1, x.shape[-1])

        seq = jnp.concatenate([
            newline(sub),                                 # sub + newlines
            vis_params['glb_GN'][0],                      # [1, 4C]
            newline(glb),
        ], axis=0)
        y = jax.nn.gelu(seq @ vis_params['proj1_w'] + vis_params['proj1_b'],
                        approximate=False)
        y = y @ vis_params['proj2_w'] + vis_params['proj2_b']
        assert y.shape[0] == num_image_tokens(h_crop, w_crop, merged)
        return y

    def encode_images_raw(self, vis_params, images
                          ) -> Tuple[List[np.ndarray], List[Tuple]]:
        if self._encode_jit is None:
            self._encode_jit = jax.jit(self.tower.forward)
        feats_out, grids = [], []
        for img in images:
            crops, (h_crop, w_crop) = hd_preprocess(img, self.num_crops)
            feats = self._encode_jit(vis_params['tower'], jnp.asarray(crops))
            y = self._hd_features(vis_params, feats, h_crop, w_crop)
            feats_out.append(np.asarray(y, np.float32))
            grids.append((1, h_crop, w_crop))
        return feats_out, grids


def build_phi3_v(config: ModelConfig):
    model = Phi3VModel(config)
    model._init_vision(config)
    return model
