"""GLM-4.5 / GLM-4.6 MoE (Glm4MoeForCausalLM).

Reference analog: ``lmdeploy/pytorch/models/glm4_moe.py``.  The MoE half IS
DeepSeek-V3's (sigmoid scores + e_score_correction_bias, group-limited top-k,
shared experts, routed scaling, dense first-k layers) — reused from
``models/deepseek.py`` — while attention is standard GQA with optional
qk-norm and PARTIAL non-interleaved rotary (first ``rope_dim`` dims,
rotate-half convention, unlike glm4's interleaved pairs).
"""
from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..nn.layers import apply_rope, rms_norm
from ..ops.attention import fill_kv_cache, paged_attention
from .deepseek import DeepseekV2Model
from .llama import LlamaModel


class Glm4MoeModel(DeepseekV2Model):

    def __init__(self, config: ModelConfig):
        # skip DeepseekV2Model.__init__'s MLA setup; take LlamaModel's base
        LlamaModel.__init__(self, config)
        cfg = config
        hf = cfg.hf_config or {}
        self.fk = cfg.first_k_dense_replace
        self.qk_norm = bool(hf.get('use_qk_norm', False))
        self.scale = 1.0 / math.sqrt(cfg.head_dim)
        # dummy MLA dims: the parent's assign plan builds (then we pop) MLA
        # entries that close over these
        self.nh, self.dn, self.dr, self.dv, self.r, self.rq = \
            cfg.num_attention_heads, 1, 1, 1, 1, None

    # -- llama-style attention shapes/plan into the dense/moe group layout --------------
    def _attn_shapes(self, L: int) -> Dict[str, Any]:
        cfg = self.config
        H, D = cfg.hidden_size, cfg.head_dim
        nh, nkv = cfg.num_attention_heads, cfg.num_key_value_heads
        d = {
            'attn_norm': (L, H),
            'mlp_norm': (L, H),
            'wq': (L, H, nh * D),
            'wk': (L, H, nkv * D),
            'wv': (L, H, nkv * D),
            'wo': (L, nh * D, H),
        }
        if cfg.attention_bias:
            d.update(bq=(L, nh * D), bk=(L, nkv * D), bv=(L, nkv * D))
        if self.qk_norm:
            d.update(q_norm=(L, D), k_norm=(L, D))
        return d

    def make_assign_plan(self):
        cfg = self.config
        plan = super().make_assign_plan()
        # drop the MLA projection entries; add llama attention names
        for l in range(cfg.num_layers):
            p = f'model.layers.{l}.self_attn.'
            for k in ('kv_a_proj_with_mqa.weight', 'kv_a_layernorm.weight',
                      'kv_b_proj.weight', 'q_proj.weight', 'q_a_proj.weight',
                      'q_a_layernorm.weight', 'q_b_proj.weight'):
                plan.pop(p + k, None)

        def T(x):
            return np.ascontiguousarray(np.swapaxes(x, -1, -2))

        ident = lambda x: x  # noqa: E731
        for l in range(cfg.num_layers):
            grp = 'layers' if l < self.fk else 'moe_layers'
            i = l if l < self.fk else l - self.fk
            p = f'model.layers.{l}.self_attn.'
            plan[p + 'q_proj.weight'] = ((grp, 'wq', i), T, None)
            plan[p + 'k_proj.weight'] = ((grp, 'wk', i), T, None)
            plan[p + 'v_proj.weight'] = ((grp, 'wv', i), T, None)
            plan[p + 'o_proj.weight'] = ((grp, 'wo', i), T, None)
            if cfg.attention_bias:
                plan[p + 'q_proj.bias'] = ((grp, 'bq', i), ident, None)
                plan[p + 'k_proj.bias'] = ((grp, 'bk', i), ident, None)
                plan[p + 'v_proj.bias'] = ((grp, 'bv', i), ident, None)
            if self.qk_norm:
                plan[p + 'q_norm.weight'] = ((grp, 'q_norm', i), ident, None)
                plan[p + 'k_norm.weight'] = ((grp, 'k_norm', i), ident, None)
        return plan

    # -- standard GQA attention with partial rotate-half rope ---------------------------
    def _attn_block(self, h, w, layer, kv_cache, meta, cos, sin,
                    slot_mapping, fresh_prefill):
        cfg = self.config
        B, T = h.shape[0], h.shape[1]
        D = cfg.head_dim
        nh, nkv = cfg.num_attention_heads, cfg.num_key_value_heads
        from ..nn.linear import linear as proj

        x = rms_norm(h, w['attn_norm'], cfg.rms_norm_eps)
        q = proj(x, w['wq'], w.get('bq')).reshape(B, T, nh, D)
        k = proj(x, w['wk'], w.get('bk')).reshape(B, T, nkv, D)
        v = proj(x, w['wv'], w.get('bv')).reshape(B, T, nkv, D)
        if self.qk_norm:
            q = rms_norm(q, w['q_norm'], cfg.rms_norm_eps)
            k = rms_norm(k, w['k_norm'], cfg.rms_norm_eps)
        r = cfg.rope_dim
        q_rot, k_rot = apply_rope(q[..., :r], k[..., :r], cos, sin)
        q = jnp.concatenate([q_rot, q[..., r:]], axis=-1)
        k = jnp.concatenate([k_rot, k[..., r:]], axis=-1)

        kv_cache = fill_kv_cache(kv_cache, k.reshape(B * T, nkv, D),
                                 v.reshape(B * T, nkv, D), slot_mapping, layer)
        attn = paged_attention(q, kv_cache, meta.block_tables,
                               meta.history_lens, meta.q_lens, self.scale,
                               layer, nkv, chunk_kv=(k, v),
                               fresh_prefill=fresh_prefill,
                               force_reference=getattr(
                                   self, 'force_ref_attention', False))
        h = h + proj(attn.reshape(B, T, nh * D), w['wo'])
        return h, kv_cache
