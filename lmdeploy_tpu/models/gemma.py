"""Gemma / Gemma-2 causal LMs.

Reference analog: ``lmdeeploy/pytorch/models/gemma.py``.  Differences from llama:
embedding scaled by sqrt(hidden), gelu(tanh) MLP, (1 + w) RMSNorm weights,
tied embeddings, and for Gemma-2: logit softcapping + post-layer norms +
alternating sliding-window attention (per-layer 'layer_window' constants:
sliding on even layers, full on odd, matching transformers Gemma2Attention).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .llama import LlamaModel


class GemmaModel(LlamaModel):

    def __init__(self, config):
        super().__init__(config)
        hf = config.hf_config or {}
        self.final_logit_softcap = hf.get('final_logit_softcapping')
        self.embed_scale = float(np.sqrt(config.hidden_size))
        # gemma-2 alternates sliding (even layers) / full (odd) attention —
        # transformers Gemma2Attention: sliding iff not bool(layer_idx % 2).
        # The per-layer window rides the scan as a 'layer_window' constant
        # (<= 0 means full attention), same mechanism as gpt-oss.
        self.layer_windows = None
        if hf.get('model_type') == 'gemma2' and config.sliding_window:
            self.layer_windows = np.asarray(
                [config.sliding_window if i % 2 == 0 else 0
                 for i in range(config.num_layers)], np.int32)

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
            plan[p + 'post_attention_layernorm.weight'] = \
                (('layers', 'mlp_norm', l), plus_one, None)
        return plan

