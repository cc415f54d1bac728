"""Gemma / Gemma-2 / Gemma-3 causal LMs.

Reference analog: ``lmdeploy/pytorch/models/gemma.py``.  Family differences
from llama, all expressed as base-class hooks:

  * embeddings scaled by sqrt(hidden); gelu(tanh) MLP; zero-centered RMSNorm
    weights ((1 + w) folded at load); tied embeddings
  * gemma-2: sandwich norms (post-attention + pre/post-feedforward), attention
    and final logit softcapping, query_pre_attn_scalar attention scale,
    sliding-window attention on even layers
  * gemma-3: qk-norm, no softcaps, 5-local:1-global sliding pattern, and DUAL
    rotary tables — local layers use rope_local_base_freq with no scaling,
    global layers the config rope (1M theta, linear-scaled); the per-layer
    'layer_window' constant selects the table inside the scan
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .llama import LlamaModel


class GemmaModel(LlamaModel):

    def __init__(self, config):
        super().__init__(config)
        hf = config.hf_config or {}
        self.gen = {'gemma': 1, 'gemma2': 2, 'gemma3_text': 3,
                    'gemma3': 3}.get(hf.get('model_type'), 1)
        self.final_logit_softcap = hf.get('final_logit_softcapping')
        self.embed_scale = float(np.sqrt(config.hidden_size))
        if self.gen >= 2:
            self.sandwich_norms = True
            self.attn_logit_softcap = hf.get('attn_logit_softcapping')
            qpas = hf.get('query_pre_attn_scalar')
            if qpas:
                self.attn_scale = float(qpas) ** -0.5
        if self.gen >= 3:
            config.qk_norm = True
            self.local_theta = float(hf.get('rope_local_base_freq', 10000.0))

        # per-layer sliding windows ride the scan as a 'layer_window'
        # constant (<= 0 = full attention), same mechanism as gpt-oss:
        #   gemma-2: sliding on EVEN layers (transformers Gemma2Attention)
        #   gemma-3: sliding unless (i+1) % sliding_window_pattern == 0
        self.layer_windows = None
        sw = config.sliding_window
        if self.gen == 2 and sw:
            self.layer_windows = np.asarray(
                [sw if i % 2 == 0 else 0 for i in range(config.num_layers)],
                np.int32)
        elif self.gen == 3 and sw:
            lt = hf.get('layer_types')
            if lt:
                self.layer_windows = np.asarray(
                    [sw if t == 'sliding_attention' else 0 for t in lt],
                    np.int32)
            else:
                pat = hf.get('sliding_window_pattern', 6)
                self.layer_windows = np.asarray(
                    [0 if (i + 1) % pat == 0 else sw
                     for i in range(config.num_layers)], np.int32)
        # the window constant drives both masking and (gemma-3) rope choice
        self.sandwich_norms = getattr(self, 'sandwich_norms', False)

    # gemma-3 keeps full-precision rope per layer type: local layers use an
    # unscaled short-theta table computed from the same table length
    def _gather_rope(self, rope_cos, rope_sin, positions):
        if self.gen < 3:
            return rope_cos[positions], rope_sin[positions]
        from ..nn.layers import make_rope_table
        lcos, lsin = make_rope_table(self.config.rope_dim,
                                     rope_cos.shape[0], self.local_theta)
        cos = jnp.stack([rope_cos[positions], lcos[positions]])   # [2,B,T,d2]
        sin = jnp.stack([rope_sin[positions], lsin[positions]])
        return cos, sin

    def _apply_rope(self, q, k, cos, sin, w=None):
        from ..nn.layers import apply_rope
        if self.gen < 3:
            return apply_rope(q, k, cos, sin)
        local = (w['layer_window'] > 0)          # traced per-layer scalar
        return apply_rope(q, k,
                          jnp.where(local, cos[1], cos[0]),
                          jnp.where(local, sin[1], sin[0]))

    def param_shapes(self):
        shapes = super().param_shapes()
        if self.layer_windows is not None:
            shapes['layers']['layer_window'] = (self.config.num_layers,)
        return shapes

    def constant_params(self):
        if self.layer_windows is None:
            return {}
        return {('layers', 'layer_window'): self.layer_windows}

    def _mlp(self, w, x: jax.Array) -> jax.Array:
        from ..nn.linear import linear as proj
        act = jax.nn.gelu(proj(x, w['w_gate']).astype(jnp.float32),
                          approximate=True)
        act = act * proj(x, w['w_up']).astype(jnp.float32)
        return proj(act.astype(x.dtype), w['w_down'])

    def make_assign_plan(self):
        plan = super().make_assign_plan()

        # gemma stores norm weights as (w - 1); adjust to our x*w convention
        def plus_one(x):
            return x.astype(np.float32) + 1.0

        cfg = self.config
        plan['model.norm.weight'] = (('final_norm',), plus_one, None)
        for l in range(cfg.num_layers):
            p = f'model.layers.{l}.'
            plan[p + 'input_layernorm.weight'] = \
                (('layers', 'attn_norm', l), plus_one, None)
            if self.sandwich_norms:
                plan[p + 'post_attention_layernorm.weight'] = \
                    (('layers', 'post_attn_norm', l), plus_one, None)
                plan[p + 'pre_feedforward_layernorm.weight'] = \
                    (('layers', 'mlp_norm', l), plus_one, None)
                plan[p + 'post_feedforward_layernorm.weight'] = \
                    (('layers', 'post_mlp_norm', l), plus_one, None)
            else:
                plan[p + 'post_attention_layernorm.weight'] = \
                    (('layers', 'mlp_norm', l), plus_one, None)
            if self.config.qk_norm:
                plan[p + 'self_attn.q_norm.weight'] = \
                    (('layers', 'q_norm', l), plus_one, None)
                plan[p + 'self_attn.k_norm.weight'] = \
                    (('layers', 'k_norm', l), plus_one, None)
        return plan
