"""Gemma-3 VLM: SigLIP tower + avg-pool projector + gemma3 text model.

Reference analog: ``lmdeploy/pytorch/models/gemma3_vl.py``.  Pieces:

  * SigLIP ViT (models/vision.SiglipVisionTower) over 896x896 crops;
  * multimodal projector: the 64x64 patch grid is average-pooled to
    ``mm_tokens_per_image`` soft tokens (16x16 for 256), normalized by a
    zero-centered gemma RMSNorm (``mm_soft_emb_norm``, +1 folded at load)
    and projected by ``mm_input_projection_weight`` (stored input-major —
    no transpose);
  * image soft tokens attend BIDIRECTIONALLY among themselves — the
    ``bidir_image_token`` hook in models/llama.py adds (img, img) pairs to
    the chunk's attention mask (reference global_attn_mask img_mask == 2);
  * the text half is the existing GemmaModel (gen 3: dual rope, qk-norm,
    sliding pattern).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..nn.layers import rms_norm
from .gemma import GemmaModel
from .vision import SiglipVisionTower

GEMMA3_MEAN = (0.5, 0.5, 0.5)
GEMMA3_STD = (0.5, 0.5, 0.5)


class Gemma3VLModel(GemmaModel):

    image_mean = GEMMA3_MEAN
    image_std = GEMMA3_STD
    image_resize_mode = 'square'

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        vis = config.vision or {}
        vc = vis.get('vision_config', {})
        self.tower = SiglipVisionTower(vc)
        self.image_token_index = vis.get('image_token_index')
        self.bidir_image_token = self.image_token_index
        self.num_image_tokens = int(vis.get('mm_tokens_per_image') or 256)
        side = int(self.num_image_tokens ** 0.5)
        assert side * side == self.num_image_tokens
        self.pool = self.tower.grid // side          # avg-pool kernel/stride

    # -- vision params -------------------------------------------------------------------
    def vis_param_shapes(self) -> Dict:
        W, H = self.tower.width, self.config.hidden_size
        return {
            'tower': self.tower.param_shapes(),
            'soft_norm': (W,),
            'proj': (W, H),
        }

    def init_vis_params(self, dtype=jnp.float32):
        rng = np.random.default_rng(2)
        W, H = self.tower.width, self.config.hidden_size
        return {'tower': self.tower.init_params(dtype=dtype),
                'soft_norm': jnp.ones((W,), dtype),
                'proj': jnp.asarray(rng.normal(0, 0.02, (W, H)), dtype)}

    def vis_assign_plan(self):
        def plus_one(x):    # gemma zero-centered rmsnorm weights
            return x.astype(np.float32) + 1.0

        ident = lambda x: x  # noqa: E731
        plan = {}
        for k, v in self.tower.make_assign_plan(
                'vision_tower.vision_model.').items():
            plan[k] = (('tower',) + v[0], v[1], v[2])
            plan['model.' + k] = plan[k]
        for k in ('multi_modal_projector.mm_soft_emb_norm.weight',
                  'model.multi_modal_projector.mm_soft_emb_norm.weight'):
            plan[k] = (('soft_norm',), plus_one, None)
        for k in ('multi_modal_projector.mm_input_projection_weight',
                  'model.multi_modal_projector.mm_input_projection_weight'):
            # stored [W_vis, H_lm]: already input-major
            plan[k] = (('proj',), ident, None)
        return plan

    def make_assign_plan(self):
        base = super().make_assign_plan()
        plan = dict(base)
        for k, v in base.items():
            if k.startswith('model.'):
                plan['language_model.' + k] = v
                plan['model.language_model.' + k[len('model.'):]] = v
        return plan

    # -- image encoding --------------------------------------------------------------------
    def encode_images(self, vis_params, pixel_values: jax.Array) -> jax.Array:
        """[N, S, S, 3] -> [N, mm_tokens_per_image, H]."""
        feats = self.tower.forward(vis_params['tower'], pixel_values)
        N, T, W = feats.shape
        G, P = self.tower.grid, self.pool
        side = G // P
        x = feats.reshape(N, side, P, side, P, W).mean(axis=(2, 4))
        x = x.reshape(N, side * side, W)
        x = rms_norm(x, vis_params['soft_norm'], self.tower.eps)
        return jnp.dot(x, vis_params['proj'],
                       preferred_element_type=jnp.float32
                       ).astype(feats.dtype)


def build_gemma3_vl(config: ModelConfig):
    return Gemma3VLModel(config)
