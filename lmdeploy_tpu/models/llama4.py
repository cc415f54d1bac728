"""Llama-4 (Scout / Maverick) text model.

Reference analog: ``lmdeploy/pytorch/models/llama4.py`` (Llama4TextModel /
Llama4ForCausalLM).  Family traits, all TPU-native:

  * interleaved dense / MoE feed-forwards: ``moe_layers`` are every
    ``interleave_moe_layer_step``-th layer (the step's LAST index).  The
    decoder is ONE ``lax.scan`` over blocks of ``step`` layers — the block's
    leading (step-1) layers carry stacked dense MLPs, its final layer the
    router + stacked experts + shared expert (same block-scan pattern as
    ``models/qwen3_next.py``).
  * llama4 MoE routing (reference Llama4TextMoe.forward): top-k router
    logits -> sigmoid gate applied to the expert INPUT (not the output),
    expert combine weight 1; a shared dense expert is always added.
  * NoPE every 4th layer: no rotary, FULL causal attention, and optional
    attention temperature tuning ``q *= 1 + attn_scale *
    log1p(floor(pos / floor_scale))``; rope layers use CHUNKED causal
    attention (``attention_chunk_size``) and optional weightless qk L2-norm
    (applied AFTER rope).  Both flags ride the scan as per-layer constants.
  * interleaved-pair rotary (original-llama complex convention) with
    llama3-style rope scaling — de-interleave / rotate-half / re-interleave
    at runtime (same helpers as ``models/glm4.py``).
"""
from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..nn.layers import apply_rope, rms_norm
from ..ops.attention import compute_slot_mapping, fill_kv_cache, paged_attention
from .glm4 import _deinterleave, _interleave
from .llama import AttnMeta, LlamaModel


class Llama4Model(LlamaModel):

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        cfg = config
        hf = cfg.hf_config or {}
        L = cfg.num_layers
        self.step = int(hf.get('interleave_moe_layer_step', 1))
        moe_layers = hf.get('moe_layers') or list(
            range(self.step - 1, L, self.step))
        assert list(moe_layers) == list(range(self.step - 1, L, self.step)), \
            'llama4 block scan expects periodic moe_layers (step-final)'
        assert L % self.step == 0
        self.n_blocks = L // self.step
        self.n_experts = int(hf.get('num_local_experts', 16))
        self.top_k = int(hf.get('num_experts_per_tok', 1))
        self.inter_moe = int(hf.get('intermediate_size', cfg.intermediate_size))
        self.inter_dense = int(hf.get('intermediate_size_mlp',
                                      cfg.intermediate_size))
        self.chunk_size = int(hf.get('attention_chunk_size', 8192))
        self.use_qk_norm = bool(hf.get('use_qk_norm', False))
        self.temp_tuning = bool(hf.get('attn_temperature_tuning', False))
        self.floor_scale = float(hf.get('floor_scale', 8192.0))
        self.attn_temp_scale = float(hf.get('attn_scale', 0.1))
        # rope on all but every 4th layer (reference Llama4TextAttention
        # use_rope = (idx+1) % 4 != 0); same flag gates chunked attention
        self.use_rope = np.asarray(
            [(i + 1) % 4 != 0 for i in range(L)], np.int32)

    # -- parameters ---------------------------------------------------------------------
    def param_shapes(self) -> Dict[str, Any]:
        cfg = self.config
        G, S = self.n_blocks, self.step
        H, D = cfg.hidden_size, cfg.head_dim
        nh, nkv = cfg.num_attention_heads, cfg.num_key_value_heads
        E, Ie, Im = self.n_experts, self.inter_moe, self.inter_dense
        blocks = {
            'attn_norm': (G, S, H), 'mlp_norm': (G, S, H),
            'wq': (G, S, H, nh * D), 'wk': (G, S, H, nkv * D),
            'wv': (G, S, H, nkv * D), 'wo': (G, S, nh * D, H),
            'use_rope': (G, S),
            'router': (G, H, E),
            'we_gate': (G, E, H, Ie), 'we_up': (G, E, H, Ie),
            'we_down': (G, E, Ie, H),
            's_gate': (G, H, Ie), 's_up': (G, H, Ie), 's_down': (G, Ie, H),
        }
        if S > 1:
            blocks.update(d_gate=(G, S - 1, H, Im), d_up=(G, S - 1, H, Im),
                          d_down=(G, S - 1, Im, H))
        return {
            'embed': (cfg.vocab_size, H),
            'blocks': blocks,
            'final_norm': (H,),
            'lm_head': (H, cfg.vocab_size),
        }

    def constant_params(self):
        return {('blocks', 'use_rope'):
                self.use_rope.reshape(self.n_blocks, self.step)}

    def init_params(self, rng=None, scale: float = 0.02):
        rng = np.random.default_rng(5)
        dtype = self.config.jnp_dtype()

        def mk(path, shape):
            if path[-1] == 'use_rope':
                return jnp.asarray(
                    self.use_rope.reshape(self.n_blocks, self.step))
            if 'norm' in path[-1]:
                return jnp.ones(shape, dtype)
            return jnp.asarray(rng.normal(0, scale, shape), dtype)

        def walk(d, path=()):
            return {k: walk(v, path + (k,)) if isinstance(v, dict)
                    else mk(path + (k,), v) for k, v in d.items()}

        return walk(self.param_shapes())

    def make_assign_plan(self):
        cfg = self.config
        S = self.step

        def T(x):
            return np.ascontiguousarray(np.swapaxes(x, -1, -2))

        def gate_half(x):   # stacked [E, H, 2I] -> gate [E, H, I]
            return np.ascontiguousarray(x[..., :x.shape[-1] // 2])

        def up_half(x):
            return np.ascontiguousarray(x[..., x.shape[-1] // 2:])

        ident = lambda x: x  # noqa: E731
        plan = {
            'model.embed_tokens.weight': (('embed',), ident, None),
            'model.norm.weight': (('final_norm',), ident, None),
            'lm_head.weight': (('lm_head',), T, None),
        }
        for l in range(cfg.num_layers):
            g, j = l // S, l % S
            p = f'model.layers.{l}.'
            a = p + 'self_attn.'
            plan[a + 'q_proj.weight'] = (('blocks', 'wq', g, j), T, None)
            plan[a + 'k_proj.weight'] = (('blocks', 'wk', g, j), T, None)
            plan[a + 'v_proj.weight'] = (('blocks', 'wv', g, j), T, None)
            plan[a + 'o_proj.weight'] = (('blocks', 'wo', g, j), T, None)
            plan[p + 'input_layernorm.weight'] = \
                (('blocks', 'attn_norm', g, j), ident, None)
            plan[p + 'post_attention_layernorm.weight'] = \
                (('blocks', 'mlp_norm', g, j), ident, None)
            f = p + 'feed_forward.'
            if j == S - 1:      # MoE layer
                plan[f + 'router.weight'] = (('blocks', 'router', g), T, None)
                # HF ships experts STACKED: gate_up_proj [E, H, 2I] (already
                # input-major), down_proj [E, I, H]
                plan[f + 'experts.gate_up_proj'] = [
                    (('blocks', 'we_gate', g), gate_half, None),
                    (('blocks', 'we_up', g), up_half, None)]
                plan[f + 'experts.down_proj'] = \
                    (('blocks', 'we_down', g), ident, None)
                sh = f + 'shared_expert.'
                plan[sh + 'gate_proj.weight'] = \
                    (('blocks', 's_gate', g), T, None)
                plan[sh + 'up_proj.weight'] = (('blocks', 's_up', g), T, None)
                plan[sh + 'down_proj.weight'] = \
                    (('blocks', 's_down', g), T, None)
            else:               # dense layer
                plan[f + 'gate_proj.weight'] = \
                    (('blocks', 'd_gate', g, j), T, None)
                plan[f + 'up_proj.weight'] = \
                    (('blocks', 'd_up', g, j), T, None)
                plan[f + 'down_proj.weight'] = \
                    (('blocks', 'd_down', g, j), T, None)
        # Llama4ForConditionalGeneration ckpts prefix the LM tree with
        # 'language_model.' — register both spellings
        for k in list(plan):
            plan['language_model.' + k] = plan[k]
        return plan

    # -- forward ---------------------------------------------------------------------------
    def forward(self, params, input_ids, positions, kv_cache, meta: AttnMeta,
                rope_cos, rope_sin, return_all_logits=False,
                fresh_prefill=False, input_embeds=None, embeds_mask=None,
                adapter_ids=None, return_hidden=False,
                return_aux_hidden=False):
        cfg = self.config
        B, T = input_ids.shape
        H, D = cfg.hidden_size, cfg.head_dim
        nh, nkv = cfg.num_attention_heads, cfg.num_key_value_heads
        scale = 1.0 / math.sqrt(D)
        block_size = kv_cache.shape[3]
        S = self.step

        hidden = params['embed'][input_ids].astype(cfg.jnp_dtype())
        if input_embeds is not None:
            hidden = jnp.where(embeds_mask[..., None],
                               input_embeds.astype(hidden.dtype), hidden)
        cos, sin = rope_cos[positions], rope_sin[positions]
        slot_mapping = compute_slot_mapping(
            meta.block_tables, meta.history_lens, meta.q_lens, T, block_size)
        posf = positions.astype(jnp.float32)
        # attention temperature tuning rides NoPE layers only
        temp = 1.0 + self.attn_temp_scale * jnp.log(
            jnp.floor(posf / self.floor_scale) + 1.0) if self.temp_tuning \
            else None

        from ..nn.linear import linear as proj

        def attn_layer(w, j, x, kv_cache, layer):
            xn = rms_norm(x, w['attn_norm'][j], cfg.rms_norm_eps)
            q = proj(xn, w['wq'][j]).reshape(B, T, nh, D)
            k = proj(xn, w['wk'][j]).reshape(B, T, nkv, D)
            v = proj(xn, w['wv'][j]).reshape(B, T, nkv, D)
            rope_on = w['use_rope'][j] > 0        # traced per-layer scalar
            qr, kr = apply_rope(_deinterleave(q), _deinterleave(k), cos, sin)
            qr, kr = _interleave(qr), _interleave(kr)
            if self.use_qk_norm:
                # weightless L2 qk-norm AFTER rope, rope layers only
                qr = rms_norm(qr, jnp.ones((), qr.dtype), 1e-6)
                kr = rms_norm(kr, jnp.ones((), kr.dtype), 1e-6)
            q = jnp.where(rope_on, qr, q)
            k = jnp.where(rope_on, kr, k)
            if temp is not None:
                # NoPE layers scale queries by the position temperature
                tq = q * temp[:, :, None, None].astype(q.dtype)
                q = jnp.where(rope_on, q, tq)
            kv_cache = fill_kv_cache(kv_cache, k.reshape(B * T, nkv, D),
                                     v.reshape(B * T, nkv, D),
                                     slot_mapping, layer)
            chunk = jnp.where(rope_on, jnp.int32(self.chunk_size),
                              jnp.int32(0))
            attn = paged_attention(q, kv_cache, meta.block_tables,
                                   meta.history_lens, meta.q_lens, scale,
                                   layer, nkv, chunk_kv=(k, v),
                                   fresh_prefill=fresh_prefill,
                                   chunk_local=chunk)
            return x + proj(attn.reshape(B, T, nh * D), w['wo'][j]), kv_cache

        def dense_mlp(w, j, x):
            xn = rms_norm(x, w['mlp_norm'][j], cfg.rms_norm_eps)
            act = jax.nn.silu(proj(xn, w['d_gate'][j]).astype(jnp.float32))
            act = act * proj(xn, w['d_up'][j]).astype(jnp.float32)
            return x + proj(act.astype(x.dtype), w['d_down'][j])

        def moe_mlp(w, x):
            from ..ops.moe import moe_ffn
            xn = rms_norm(x, w['mlp_norm'][S - 1], cfg.rms_norm_eps)
            xf = xn.reshape(B * T, H)
            logits = jnp.dot(xf, w['router'],
                             preferred_element_type=jnp.float32)
            topw, topi = jax.lax.top_k(logits, self.top_k)
            gate = jax.nn.sigmoid(topw).astype(xf.dtype)       # [N, K]
            ones = jnp.ones((B * T, 1), jnp.float32)
            out = jnp.zeros((B * T, H), jnp.float32)
            for kk in range(self.top_k):
                # reference Llama4TextMoe: sigmoid gate scales the expert
                # INPUT; combine weight is 1
                out = out + moe_ffn(
                    xf * gate[:, kk:kk + 1], topi[:, kk:kk + 1], ones,
                    w['we_gate'], w['we_up'], w['we_down'], xf.dtype,
                    allow_ragged=not getattr(self, 'ep_sharded', False)
                ).astype(jnp.float32)
            act = jax.nn.silu(jnp.dot(xf, w['s_gate'],
                                      preferred_element_type=jnp.float32))
            act = act * jnp.dot(xf, w['s_up'],
                                preferred_element_type=jnp.float32)
            out = out + jnp.dot(act.astype(xf.dtype), w['s_down'],
                                preferred_element_type=jnp.float32)
            return x + out.reshape(B, T, H).astype(x.dtype)

        def block_fn(carry, w):
            h, kv_cache, blk = carry
            base = blk * S
            for j in range(S - 1):
                h, kv_cache = attn_layer(w, j, h, kv_cache, base + j)
                h = dense_mlp(w, j, h)
            h, kv_cache = attn_layer(w, S - 1, h, kv_cache, base + S - 1)
            h = moe_mlp(w, h)
            return (h, kv_cache, blk + 1), None

        (hidden, kv_cache, _), _ = jax.lax.scan(
            block_fn, (hidden, kv_cache, jnp.int32(0)), params['blocks'])
        hidden_prenorm = hidden
        hidden = rms_norm(hidden, params['final_norm'], cfg.rms_norm_eps)

        def head(x):
            return self._head(params, x)

        if return_all_logits:
            if return_hidden:
                return head(hidden), kv_cache, hidden_prenorm
            return head(hidden), kv_cache
        last_idx = jnp.maximum(meta.q_lens - 1, 0)
        last_hidden = jnp.take_along_axis(
            hidden, last_idx[:, None, None], axis=1)[:, 0]
        return head(last_hidden), kv_cache
