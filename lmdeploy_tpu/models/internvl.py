"""InternVL-family VLM: InternViT tower + pixel-shuffle + MLP projector + LM.

Reference analog: ``lmdeploy/vl/model/internvl.py`` (InternVLVisionModel:
``image_tokens_per_patch = (size/patch)^2 * downsample^2``, ``:126``) wrapping
HF InternVLChatModel checkpoints.

The language half is InternLM2 or a llama-family LM depending on
``llm_config.architectures``; the vision half is ``InternViTTower`` +
``pixel_shuffle`` + the mlp1 projector (LayerNorm -> Linear -> GELU -> Linear).
Image features replace ``<IMG_CONTEXT>`` tokens via the shared prefill
embeds-override.  Single 448-view preprocessing this round (the reference's
dynamic multi-tile splitting is a later addition); ImageNet normalization.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from .vision import InternViTTower, _layer_norm, pixel_shuffle

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class _InternVLMixin:
    """Vision surface shared by the InternLM2-/llama-based InternVL variants."""

    def _init_vision(self, config: ModelConfig):
        vis = config.vision or {}
        self.tower = InternViTTower(vis.get('vision_config', {}))
        self.downsample_ratio = vis.get('downsample_ratio', 0.5)
        s = int(round(1 / self.downsample_ratio))
        self.num_image_tokens = self.tower.num_patches // (s * s)
        self._shuffle_s = s
        # resolved from the tokenizer by the engine (it is a tokenizer id, not
        # a config field in InternVL checkpoints)
        self.image_token_index = vis.get('image_token_index')
        self.image_marker = '<IMG_CONTEXT>'
        self.image_mean = IMAGENET_MEAN
        self.image_std = IMAGENET_STD

    def vis_param_shapes(self) -> Dict:
        W, H = self.tower.width, self.config.hidden_size
        C = W * self._shuffle_s * self._shuffle_s
        return {
            'tower': self.tower.param_shapes(),
            'ln_w': (C,), 'ln_b': (C,),
            'proj1': (C, H), 'proj1_b': (H,),
            'proj2': (H, H), 'proj2_b': (H,),
        }

    def init_vis_params(self, dtype=jnp.float32):
        rng = np.random.default_rng(6)
        W, H = self.tower.width, self.config.hidden_size
        C = W * self._shuffle_s * self._shuffle_s

        def mk(shape):
            return jnp.asarray(rng.normal(0, 0.02, shape), dtype)

        return {'tower': self.tower.init_params(dtype=dtype),
                'ln_w': jnp.ones((C,), dtype), 'ln_b': jnp.zeros((C,), dtype),
                'proj1': mk((C, H)), 'proj1_b': jnp.zeros((H,), dtype),
                'proj2': mk((H, H)), 'proj2_b': jnp.zeros((H,), dtype)}

    def vis_assign_plan(self):
        def T(x):
            return np.ascontiguousarray(np.swapaxes(x, -1, -2))

        ident = lambda x: x  # noqa: E731
        plan = {}
        for k, v in self.tower.make_assign_plan('vision_model.').items():
            plan[k] = (('tower',) + v[0], v[1], v[2])
        plan.update({
            'mlp1.0.weight': (('ln_w',), ident, None),
            'mlp1.0.bias': (('ln_b',), ident, None),
            'mlp1.1.weight': (('proj1',), T, None),
            'mlp1.1.bias': (('proj1_b',), ident, None),
            'mlp1.3.weight': (('proj2',), T, None),
            'mlp1.3.bias': (('proj2_b',), ident, None),
        })
        return plan

    def encode_images(self, vis_params, pixel_values: jax.Array) -> jax.Array:
        """[N, 448, 448, 3] -> [N, num_image_tokens, hidden]."""
        grid = self.tower.forward(vis_params['tower'], pixel_values)
        x = pixel_shuffle(grid, self.downsample_ratio)        # [N, g, g, C]
        N = x.shape[0]
        x = x.reshape(N, -1, x.shape[-1])
        x = _layer_norm(x, vis_params['ln_w'], vis_params['ln_b'],
                        self.tower.eps)
        x = x @ vis_params['proj1'] + vis_params['proj1_b']
        x = jax.nn.gelu(x)
        return x @ vis_params['proj2'] + vis_params['proj2_b']

    # prefix every LM checkpoint key (InternVL stores the LM under
    # language_model.)
    def make_assign_plan(self):
        base = super().make_assign_plan()
        return {'language_model.' + k: v for k, v in base.items()}


def build_internvl(config: ModelConfig):
    vis = config.vision or {}
    llm_archs = vis.get('llm_architectures') or ['InternLM2ForCausalLM']
    if any('InternLM2' in a for a in llm_archs):
        from .internlm2 import InternLM2Model
        base = InternLM2Model
    else:
        from .llama import LlamaModel
        base = LlamaModel
        if any('Qwen2' in a for a in llm_archs):
            config.attention_bias = True

    cls = type('InternVLModel', (_InternVLMixin, base), {})
    model = cls(config)
    model._init_vision(config)
    return model
