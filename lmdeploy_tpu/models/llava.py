"""Llava-family VLM: CLIP vision tower + MLP projector + Llama/Mistral LM.

Reference analog: ``lmdeploy/vl/model/llava_hf.py`` (vision side) +
``lmdeploy/serve/vl_async_engine.py`` (prompt/feature plumbing).  The language
half IS a LlamaModel — same decode/prefill executables, same cache layout; the
only LM-side addition is the ``input_embeds``/``embeds_mask`` override in
``LlamaModel.forward`` that swaps image-token rows for projected vision
features during prefill.

Vision params are kept in a SEPARATE tree from the LM params: they are only
touched by ``encode_images`` (once per image at admission), so they must not
ride — or be donated with — the per-step jit arguments.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from .llama import LlamaModel
from .vision import ClipVisionTower, _ACTS


class LlavaModel(LlamaModel):
    """llava-1.5 / llava-next(static-geometry) / vicuna+CLIP checkpoints."""

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        vis = config.vision or {}
        self.image_token_index = vis.get('image_token_index', 32000)
        self.tower = ClipVisionTower(
            vis.get('vision_config', {}),
            feature_layer=vis.get('vision_feature_layer', -2),
            select_strategy=vis.get('vision_feature_select_strategy', 'default'))
        self.projector_act = _ACTS[vis.get('projector_hidden_act', 'gelu')]
        self.num_image_tokens = self.tower.num_image_tokens

    # -- vision params (separate tree from LM params) ----------------------------------
    def vis_param_shapes(self) -> Dict:
        W, H = self.tower.width, self.config.hidden_size
        return {
            'tower': self.tower.param_shapes(),
            'proj1': (W, H), 'proj1_b': (H,),
            'proj2': (H, H), 'proj2_b': (H,),
        }

    def init_vis_params(self, dtype=jnp.float32):
        rng = np.random.default_rng(1)
        tower = self.tower.init_params(dtype=dtype)
        W, H = self.tower.width, self.config.hidden_size

        def mk(shape):
            return jnp.asarray(rng.normal(0, 0.02, shape), dtype)

        return {'tower': tower, 'proj1': mk((W, H)),
                'proj1_b': jnp.zeros((H,), dtype),
                'proj2': mk((H, H)), 'proj2_b': jnp.zeros((H,), dtype)}

    def vis_assign_plan(self):
        """HF llava checkpoint: vision_tower.* + multi_modal_projector.*."""
        def T(x):
            return np.ascontiguousarray(np.swapaxes(x, -1, -2))

        ident = lambda x: x  # noqa: E731
        plan = {}
        for k, v in self.tower.make_assign_plan(
                'vision_tower.vision_model.').items():
            plan[k] = (('tower',) + v[0], v[1], v[2])
        plan.update({
            'multi_modal_projector.linear_1.weight': (('proj1',), T, None),
            'multi_modal_projector.linear_1.bias': (('proj1_b',), ident, None),
            'multi_modal_projector.linear_2.weight': (('proj2',), T, None),
            'multi_modal_projector.linear_2.bias': (('proj2_b',), ident, None),
        })
        return plan

    # -- LM weight mapping: llava prefixes the LM keys ----------------------------------
    def make_assign_plan(self):
        base = super().make_assign_plan()
        plan = {}
        for k, v in base.items():
            # transformers <4.52 spells it language_model.model.*, newer
            # checkpoints model.language_model.* — accept both.
            if k.startswith('model.'):
                plan['language_model.' + k] = v
                plan['model.language_model.' + k[len('model.'):]] = v
            else:  # lm_head.weight
                plan['language_model.' + k] = v
                plan[k] = v
        return plan

    # -- image encoding ----------------------------------------------------------------
    def encode_images(self, vis_params, pixel_values: jax.Array) -> jax.Array:
        """[N, S, S, 3] pixels -> [N, num_image_tokens, hidden] LM-space features."""
        feats = self.tower.forward(vis_params['tower'], pixel_values)
        x = feats @ vis_params['proj1'] + vis_params['proj1_b']
        x = self.projector_act(x)
        x = x @ vis_params['proj2'] + vis_params['proj2_b']
        return x
