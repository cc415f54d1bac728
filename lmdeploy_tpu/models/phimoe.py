"""PhiMoE (Phi-3.5-MoE): mixtral-style experts + LayerNorm + sparsemixer.

Reference analog: ``lmdeploy/pytorch/models/phimoe.py``.  Differences from
mixtral: LayerNorm (weight + bias) instead of RMSNorm, biased attention
projections, an optional lm_head bias, longrope scaling (handled by
nn/layers.make_rope_table), and SPARSEMIXER routing — top-2 selection where
each expert's weight is its softmax probability under a relative-threshold
mask (|max - s| / max(|s|, max) > 2*jitter masked out), NOT a renormalized
top-k softmax.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from .mixtral import MixtralModel

NEG_INF = float('-inf')


def sparsemixer_route(logits: jax.Array, jitter_eps: float):
    """Inference-time sparsemixer: (top_idx [N, 2], top_w [N, 2])."""

    def pick(scores, full_abs):
        mx = jnp.max(scores, axis=-1, keepdims=True)
        factor = jnp.maximum(full_abs, jnp.abs(mx))
        mask = ((mx - scores) / factor) > (2 * jitter_eps)
        masked = jnp.where(mask, NEG_INF, scores)
        sel = jnp.argmax(scores, axis=-1)
        gates = jax.nn.softmax(masked, axis=-1)
        mult = jnp.take_along_axis(gates, sel[:, None], axis=-1)[:, 0]
        return sel, mult

    full_abs = jnp.abs(logits)
    e1, m1 = pick(logits, full_abs)
    scores2 = logits.at[jnp.arange(logits.shape[0]), e1].set(NEG_INF)
    e2, m2 = pick(scores2, full_abs)
    return (jnp.stack([e1, e2], axis=-1).astype(jnp.int32),
            jnp.stack([m1, m2], axis=-1))


class PhiMoeModel(MixtralModel):

    def __init__(self, config: ModelConfig):
        hf = config.hf_config or {}
        config.attention_bias = bool(hf.get('attention_bias', True))
        super().__init__(config)
        self.jitter = float(hf.get('router_jitter_noise', 0.01))
        self.lm_head_bias = bool(hf.get('lm_head_bias', False))

    # -- LayerNorm ------------------------------------------------------------------------
    def _norm(self, x, weight, bias, eps):
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
        y = (xf - mu) * jax.lax.rsqrt(var + eps) * weight
        if bias is not None:
            y = y + bias
        return y.astype(x.dtype)

    def param_shapes(self) -> Dict[str, Any]:
        cfg = self.config
        shapes = super().param_shapes()
        L, H = cfg.num_layers, cfg.hidden_size
        shapes['layers'].update(attn_norm_b=(L, H), mlp_norm_b=(L, H),
                                bo=(L, H))
        shapes['final_norm_b'] = (H,)
        if self.lm_head_bias:
            shapes['lm_head_b'] = (cfg.vocab_size,)
        return shapes

    def _head(self, params, x):
        logits = super()._head(params, x)
        if 'lm_head_b' in params:
            logits = logits + params['lm_head_b']
        return logits

    # -- sparsemixer routing ---------------------------------------------------------------
    def _mlp(self, w, x: jax.Array) -> jax.Array:
        from ..ops.moe import eplb_remap, moe_ffn
        B, T, H = x.shape
        xf = x.reshape(B * T, H)
        logits = jnp.dot(xf, w['router'],
                         preferred_element_type=jnp.float32)
        top_idx, top_w = sparsemixer_route(logits, self.jitter)
        top_idx = eplb_remap(w, top_idx)
        out = moe_ffn(xf, top_idx, top_w, w['we_gate'], w['we_up'],
                      w['we_down'], x.dtype,
                      allow_ragged=not getattr(self, 'ep_sharded', False))
        return out.reshape(B, T, H).astype(x.dtype)

    def make_assign_plan(self):
        cfg = self.config
        plan = super().make_assign_plan()

        ident = lambda x: x  # noqa: E731

        def T(x):
            return np.ascontiguousarray(np.swapaxes(x, -1, -2))

        plan['model.norm.bias'] = (('final_norm_b',), ident, None)
        if self.lm_head_bias:
            plan['lm_head.bias'] = (('lm_head_b',), ident, None)
        for l in range(cfg.num_layers):
            p = f'model.layers.{l}.'
            plan[p + 'input_layernorm.bias'] = \
                (('layers', 'attn_norm_b', l), ident, None)
            plan[p + 'post_attention_layernorm.bias'] = \
                (('layers', 'mlp_norm_b', l), ident, None)
            plan[p + 'self_attn.o_proj.bias'] = \
                (('layers', 'bo', l), ident, None)
        return plan
