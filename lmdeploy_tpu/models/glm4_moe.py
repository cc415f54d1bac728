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
        if self.quant_method == 'fp8_blocked':
            # stacked expert layouts carry no blocked leaves here (yet);
            # dequantize while streaming so fp8 checkpoints load correctly
            self.quant_method = None
            self.dequant_on_load = True

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


class Glm4MoeMTP(Glm4MoeModel):
    """GLM-4.5/4.6 Multi-Token-Prediction module as a speculative proposer.

    Reference analog: ``lmdeploy/pytorch/models/glm4moe_mtp.py`` — the
    DeepSeek MTP skeleton (``eh_proj([enorm(embed) ; hnorm(h_target)])`` +
    ONE decoder block + shared_head norm) with GLM's GQA attention (qk-norm,
    partial rotate-half rope) instead of MLA.  ``step`` matches
    ``EagleHead.step`` so the engine's EAGLE speculative machinery drives it
    (see engine/spec_agent.py method='deepseek_mtp').
    """

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        self.mtp_index = config.num_layers
        self.moe_mlp = bool(config.num_experts)

    def param_shapes(self) -> Dict[str, Any]:
        cfg = self.config
        H = cfg.hidden_size
        layer = self._attn_shapes(1)
        if self.moe_mlp:
            E = cfg.num_experts
            Ie = cfg.moe_intermediate_size or cfg.intermediate_size
            Is = (cfg.num_shared_experts or 0) * Ie
            layer.update(router=(1, H, E), router_bias=(1, E),
                         we_gate=(1, E, H, Ie), we_up=(1, E, H, Ie),
                         we_down=(1, E, Ie, H))
            if Is:
                layer.update(ws_gate=(1, H, Is), ws_up=(1, H, Is),
                             ws_down=(1, Is, H))
        else:
            I = cfg.intermediate_size
            layer.update(w_gate=(1, H, I), w_up=(1, H, I), w_down=(1, I, H))
        return {
            'enorm': (H,), 'hnorm': (H,), 'eh_proj': (2 * H, H),
            'shead_norm': (H,), 'layer': layer,
        }

    def make_assign_plan(self):
        cfg = self.config

        def T(x):
            return np.ascontiguousarray(np.swapaxes(x, -1, -2))

        ident = lambda x: x  # noqa: E731
        p = f'model.layers.{self.mtp_index}.'
        a = p + 'self_attn.'
        plan: Dict[str, Any] = {
            p + 'enorm.weight': (('enorm',), ident, None),
            p + 'hnorm.weight': (('hnorm',), ident, None),
            p + 'eh_proj.weight': (('eh_proj',), T, None),
            p + 'shared_head.norm.weight': (('shead_norm',), ident, None),
            p + 'input_layernorm.weight':
                (('layer', 'attn_norm', 0), ident, None),
            p + 'post_attention_layernorm.weight':
                (('layer', 'mlp_norm', 0), ident, None),
            a + 'q_proj.weight': (('layer', 'wq', 0), T, None),
            a + 'k_proj.weight': (('layer', 'wk', 0), T, None),
            a + 'v_proj.weight': (('layer', 'wv', 0), T, None),
            a + 'o_proj.weight': (('layer', 'wo', 0), T, None),
        }
        if cfg.attention_bias:
            plan[a + 'q_proj.bias'] = (('layer', 'bq', 0), ident, None)
            plan[a + 'k_proj.bias'] = (('layer', 'bk', 0), ident, None)
            plan[a + 'v_proj.bias'] = (('layer', 'bv', 0), ident, None)
        if self.qk_norm:
            plan[a + 'q_norm.weight'] = (('layer', 'q_norm', 0), ident, None)
            plan[a + 'k_norm.weight'] = (('layer', 'k_norm', 0), ident, None)
        if self.moe_mlp:
            from .mixtral import _ExpertSlice
            E = cfg.num_experts
            plan[p + 'mlp.gate.weight'] = (('layer', 'router', 0), T, None)
            plan[p + 'mlp.gate.e_score_correction_bias'] = \
                (('layer', 'router_bias', 0), ident, None)
            for e in range(E):
                q = p + f'mlp.experts.{e}.'
                plan[q + 'gate_proj.weight'] = \
                    (('layer', 'we_gate', 0), T, _ExpertSlice(e))
                plan[q + 'up_proj.weight'] = \
                    (('layer', 'we_up', 0), T, _ExpertSlice(e))
                plan[q + 'down_proj.weight'] = \
                    (('layer', 'we_down', 0), T, _ExpertSlice(e))
            if cfg.num_shared_experts:
                q = p + 'mlp.shared_experts.'
                plan[q + 'gate_proj.weight'] = \
                    (('layer', 'ws_gate', 0), T, None)
                plan[q + 'up_proj.weight'] = (('layer', 'ws_up', 0), T, None)
                plan[q + 'down_proj.weight'] = \
                    (('layer', 'ws_down', 0), T, None)
        else:
            plan[p + 'mlp.gate_proj.weight'] = \
                (('layer', 'w_gate', 0), T, None)
            plan[p + 'mlp.up_proj.weight'] = (('layer', 'w_up', 0), T, None)
            plan[p + 'mlp.down_proj.weight'] = \
                (('layer', 'w_down', 0), T, None)
        return plan

    # -- draft step (EagleHead-compatible; mirrors DeepseekMTP.step) ---------------------
    def step(self, params, tparams, h_cond, token, position, kv_cache,
             block_tables, q_lens, cos_tab, sin_tab, max_len):
        cfg = self.config
        from ..ops.attention import compute_slot_mapping
        from .llama import AttnMeta

        emb = tparams['embed'][token].astype(h_cond.dtype)           # [B, H]
        x = jnp.concatenate(
            [rms_norm(emb, params['enorm'], cfg.rms_norm_eps),
             rms_norm(h_cond, params['hnorm'], cfg.rms_norm_eps)],
            axis=-1) @ params['eh_proj']
        xt = x[:, None, :]

        pos = jnp.clip(position, 0, max_len - 1)[:, None]
        cos, sin = cos_tab[pos], sin_tab[pos]
        slot = compute_slot_mapping(block_tables, position, q_lens, 1,
                                    kv_cache.shape[3])
        w = jax.tree_util.tree_map(lambda a_: a_[0], params['layer'])
        meta = AttnMeta(block_tables=block_tables, history_lens=position,
                        q_lens=q_lens)
        h, kv_cache = self._attn_block(xt, w, jnp.int32(0), kv_cache, meta,
                                       cos, sin, slot, False)
        y = rms_norm(h, w['mlp_norm'], cfg.rms_norm_eps)
        h = h + (self._moe_mlp(w, y) if self.moe_mlp else self._mlp(w, y))
        h_new = h[:, 0]

        lm_head = tparams.get('lm_head')
        if lm_head is None:
            lm_head = tparams['embed'].T
        hn = rms_norm(h_new, params['shead_norm'], cfg.rms_norm_eps)
        logits = jnp.dot(hn, lm_head, preferred_element_type=jnp.float32)
        return logits, h_new, kv_cache
