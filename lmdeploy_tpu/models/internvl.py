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


class _InternVL3HFMixin(_InternVLMixin):
    """InternVL3 in the NATIVE transformers format (InternVLForConditional-
    Generation; reference: ``lmdeploy/pytorch/models/internvl3_hf.py``).

    Same compute as the legacy InternVLChatModel path — InternViT tower,
    pixel-shuffle, LayerNorm->Linear->GELU->Linear projector — but the
    checkpoint re-packages everything: the tower under
    ``model.vision_tower.`` with SPLIT (bias-free) q/k/v and lambda_1/2
    layer scales, the projector as ``model.multi_modal_projector.*``, and
    the LM under ``model.language_model.`` (+ top-level lm_head).
    """

    def vis_assign_plan(self):
        W = self.tower.width
        P = self.tower.patch_size

        def conv_to_mat(x):
            return np.ascontiguousarray(
                np.transpose(x, (2, 3, 1, 0)).reshape(P * P * 3, W))

        def T(x):
            return np.ascontiguousarray(np.swapaxes(x, -1, -2))

        ident = lambda x: x  # noqa: E731
        plan = {
            'embeddings.patch_embeddings.projection.weight':
                (('tower', 'patch_embed'), conv_to_mat, None),
            'embeddings.patch_embeddings.projection.bias':
                (('tower', 'patch_bias'), ident, None),
            'embeddings.cls_token':
                (('tower', 'class_embed'), lambda x: x.reshape(-1), None),
            'embeddings.position_embeddings':
                (('tower', 'pos_embed'), lambda x: x.reshape(-1, W), None),
        }
        per_layer = [
            ('layernorm_before.weight', 'n1_w', ident, None),
            ('layernorm_before.bias', 'n1_b', ident, None),
            ('layernorm_after.weight', 'n2_w', ident, None),
            ('layernorm_after.bias', 'n2_b', ident, None),
            # split q/k/v -> fused wqkv column slices (bias-free in ckpt;
            # the tower's zero-initialized bqkv is a no-op)
            ('attention.q_proj.weight', 'wqkv', T, slice(0, W)),
            ('attention.k_proj.weight', 'wqkv', T, slice(W, 2 * W)),
            ('attention.v_proj.weight', 'wqkv', T, slice(2 * W, 3 * W)),
            ('attention.q_proj.bias', 'bqkv', ident, slice(0, W)),
            ('attention.k_proj.bias', 'bqkv', ident, slice(W, 2 * W)),
            ('attention.v_proj.bias', 'bqkv', ident, slice(2 * W, 3 * W)),
            ('attention.projection_layer.weight', 'wo', T, None),
            ('attention.projection_layer.bias', 'bo', ident, None),
            ('attention.q_norm.weight', 'q_norm', ident, None),
            ('attention.k_norm.weight', 'k_norm', ident, None),
            ('lambda_1', 'ls1', ident, None),
            ('lambda_2', 'ls2', ident, None),
            ('mlp.fc1.weight', 'fc1', T, None),
            ('mlp.fc1.bias', 'b1', ident, None),
            ('mlp.fc2.weight', 'fc2', T, None),
            ('mlp.fc2.bias', 'b2', ident, None),
        ]
        for hf, name, transform, col in per_layer:
            for layer in range(self.tower.num_layers):
                plan[f'encoder.layer.{layer}.{hf}'] = \
                    (('tower', 'layers', name, layer), transform, col)
        plan = {f'vision_tower.{k}': v for k, v in plan.items()}
        plan.update({
            'multi_modal_projector.layer_norm.weight':
                (('ln_w',), ident, None),
            'multi_modal_projector.layer_norm.bias':
                (('ln_b',), ident, None),
            'multi_modal_projector.linear_1.weight': (('proj1',), T, None),
            'multi_modal_projector.linear_1.bias':
                (('proj1_b',), ident, None),
            'multi_modal_projector.linear_2.weight': (('proj2',), T, None),
            'multi_modal_projector.linear_2.bias':
                (('proj2_b',), ident, None),
        })
        # transformers >= 4.56 nests everything under a leading 'model.'
        for k in list(plan):
            plan['model.' + k] = plan[k]
        return plan

    def make_assign_plan(self):
        base = super(_InternVLMixin, self).make_assign_plan()
        plan = {}
        for k, v in base.items():
            # both spellings: language_model.model.X (older transformers)
            # and model.language_model.X (>= 4.56)
            plan['language_model.' + k] = v
            if k.startswith('model.'):
                plan['model.language_model.' + k[len('model.'):]] = v
            else:
                plan[k] = v                     # lm_head.weight stays top-level
        return plan


def build_internvl_hf(config: ModelConfig):
    vis = config.vision or {}
    llm_archs = vis.get('llm_architectures') or ['Qwen2ForCausalLM']
    from .llama import LlamaModel
    base = LlamaModel
    if any('Qwen2' in a for a in llm_archs):
        config.attention_bias = True
    if any('Qwen3' in a for a in llm_archs):
        config.qk_norm = True

    cls = type('InternVL3HFModel', (_InternVL3HFMixin, base), {})
    model = cls(config)
    model._init_vision(config)
    return model


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
