"""StarCoder2: GPT-style decoder — LayerNorm, biased projections, plain MLP.

Reference analog: ``lmdeploy/pytorch/models/starcoder2.py``.  Diverges from
the llama family in exactly three ways, each a hook override: LayerNorm
(weight + bias) instead of RMSNorm, a non-gated ``c_fc -> gelu_tanh ->
c_proj`` MLP, and bias on every projection.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from .llama import LlamaModel


class Starcoder2Model(LlamaModel):

    def __init__(self, config: ModelConfig):
        config.attention_bias = bool(
            (config.hf_config or {}).get('use_bias', True))
        super().__init__(config)

    # -- LayerNorm hook -----------------------------------------------------------------
    def _norm(self, x, weight, bias, eps):
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
        y = (xf - mu) * jax.lax.rsqrt(var + eps) * weight
        if bias is not None:
            y = y + bias
        return y.astype(x.dtype)

    # -- plain (non-gated) MLP ----------------------------------------------------------
    def _mlp(self, w, x):
        from ..nn.linear import linear as proj
        h = proj(x, w['c_fc'], w.get('c_fc_b'))
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=True)
        return proj(h.astype(x.dtype), w['c_proj'], w.get('c_proj_b'))

    # -- parameters -----------------------------------------------------------------------
    def _mlp_shapes(self, L: int, H: int, I: int) -> Dict[str, Any]:
        return {'c_fc': self._linear_shape(L, H, I), 'c_fc_b': (L, I),
                'c_proj': self._linear_shape(L, I, H), 'c_proj_b': (L, H)}

    def param_shapes(self) -> Dict[str, Any]:
        cfg = self.config
        shapes = super().param_shapes()
        L, H = cfg.num_layers, cfg.hidden_size
        shapes['layers'].update(
            attn_norm_b=(L, H), mlp_norm_b=(L, H),
            bo=(L, H))                                  # o_proj bias
        shapes['final_norm_b'] = (H,)
        return shapes

    def make_assign_plan(self):
        cfg = self.config
        plan = super().make_assign_plan()
        for l in range(cfg.num_layers):
            for mod in ('mlp.gate_proj', 'mlp.up_proj', 'mlp.down_proj'):
                plan.pop(f'model.layers.{l}.{mod}.weight', None)

        def T(x):
            return np.ascontiguousarray(np.swapaxes(x, -1, -2))

        ident = lambda x: x  # noqa: E731
        plan['model.norm.bias'] = (('final_norm_b',), ident, None)
        for l in range(cfg.num_layers):
            p = f'model.layers.{l}.'
            plan[p + 'input_layernorm.bias'] = \
                (('layers', 'attn_norm_b', l), ident, None)
            plan[p + 'post_attention_layernorm.bias'] = \
                (('layers', 'mlp_norm_b', l), ident, None)
            plan[p + 'self_attn.o_proj.bias'] = (('layers', 'bo', l), ident, None)
            plan[p + 'mlp.c_fc.weight'] = (('layers', 'c_fc', l), T, None)
            plan[p + 'mlp.c_fc.bias'] = (('layers', 'c_fc_b', l), ident, None)
            plan[p + 'mlp.c_proj.weight'] = (('layers', 'c_proj', l), T, None)
            plan[p + 'mlp.c_proj.bias'] = (('layers', 'c_proj_b', l), ident, None)
        return plan
