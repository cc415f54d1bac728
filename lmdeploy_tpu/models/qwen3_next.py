"""Qwen3-Next: hybrid gated-DeltaNet linear attention + full attention.

Reference analog: ``lmdeploy/pytorch/models/qwen3_next.py`` (GatedDeltaNet +
gated full attention + sparse MoE with a shared expert) and TurboMind's
``src/turbomind/kernels/linear_attn/`` chunked delta-rule kernels.

TPU-first structure: the network repeats a BLOCK of ``full_attention_interval``
layers — (interval-1) gated-DeltaNet layers followed by one full-attention
layer, each with its own (MoE) mlp — so the decoder is one ``lax.scan`` over
blocks with per-block stacked weights:

  * linear layers keep per-sequence recurrent state ``[n_lin, Bslots, Hv, dk,
    dv]`` and conv state ``[n_lin, Bslots, K-1, conv_dim]`` indexed by batch
    slot, carried and donated through every step exactly like the paged KV
    cache (the cache pytree is ``{'pages', 'conv', 'rec'}``);
  * only the full-attention layers have paged KV — the cache allocates
    ``num_layers / interval`` page layers (config.num_cache_layers);
  * the gated delta recurrence and depthwise causal conv live in
    ``ops/gated_delta.py`` (lax.scan over time; exact w.r.t. decode by
    construction), verified against the transformers reference.

Limitations (honest guards at the engine level): host-RAM KV swap, prefix-
block reuse and PD migration are disabled for linear-state models — pages
alone cannot reconstruct the recurrent state.
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
from ..ops.gated_delta import causal_conv1d, gate_decay, gated_delta_scan
from .llama import AttnMeta, LlamaModel
from .mixtral import _ExpertSlice


class Qwen3NextModel(LlamaModel):
    """Hybrid linear/full-attention decoder with sparse-MoE mlps."""

    has_linear_state = True

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        cfg = config
        hf = cfg.hf_config or {}
        lt = hf.get('layer_types')
        if lt:
            interval = lt.index('full_attention') + 1
            assert lt == (['linear_attention'] * (interval - 1)
                          + ['full_attention']) * (cfg.num_layers // interval), \
                'non-uniform layer_types pattern not supported'
        else:
            interval = hf.get('full_attention_interval', 4)
        assert cfg.num_layers % interval == 0
        self.interval = interval
        self.n_blocks = cfg.num_layers // interval
        self.n_lin_per_block = interval - 1
        self.n_lin = self.n_blocks * self.n_lin_per_block

        self.lin_hk = hf.get('linear_num_key_heads', 16)
        self.lin_hv = hf.get('linear_num_value_heads', 32)
        self.lin_dk = hf.get('linear_key_head_dim', 128)
        self.lin_dv = hf.get('linear_value_head_dim', 128)
        self.conv_k = hf.get('linear_conv_kernel_dim', 4)
        self.key_dim = self.lin_hk * self.lin_dk
        self.value_dim = self.lin_hv * self.lin_dv
        self.conv_dim = 2 * self.key_dim + self.value_dim
        self.ratio = self.lin_hv // self.lin_hk

        self.n_experts = hf.get('num_experts', 0)
        self.top_k = hf.get('num_experts_per_tok', 0)
        self.moe_inter = hf.get('moe_intermediate_size', cfg.intermediate_size)
        self.shared_inter = hf.get('shared_expert_intermediate_size', 0)
        self.norm_topk = hf.get('norm_topk_prob', True)
        self.conv_bias = bool(hf.get('linear_conv_bias', False))

    # -- state buffers carried with the cache --------------------------------------------
    def state_shapes(self, num_slots: int) -> Dict[str, Any]:
        dt = self.config.jnp_dtype()
        return {
            'conv': jax.ShapeDtypeStruct(
                (self.n_lin, num_slots, self.conv_k - 1, self.conv_dim), dt),
            'rec': jax.ShapeDtypeStruct(
                (self.n_lin, num_slots, self.lin_hv, self.lin_dk, self.lin_dv),
                jnp.float32),
        }

    # -- parameters -----------------------------------------------------------------------
    def _lin_in_shapes(self) -> Dict[str, int]:
        """Gated-DeltaNet input-projection output widths (hook: Qwen3.5
        splits the fused qkvz/ba projections — models/qwen3_5.py)."""
        return {
            'in_qkvz': self.key_dim * 2 + self.value_dim * 2,
            'in_ba': 2 * self.lin_hv,
        }

    def _mlp_shapes(self, NB: int, IV: int, H: int) -> Dict[str, Any]:
        """Per-layer mlp parameter shapes (hook: Qwen3.5-dense overrides)."""
        return {
            'router': (NB, IV, H, self.n_experts),
            'we_gate': (NB, IV, self.n_experts, H, self.moe_inter),
            'we_up': (NB, IV, self.n_experts, H, self.moe_inter),
            'we_down': (NB, IV, self.n_experts, self.moe_inter, H),
            'ws_gate': (NB, IV, H, self.shared_inter),
            'ws_up': (NB, IV, H, self.shared_inter),
            'ws_down': (NB, IV, self.shared_inter, H),
            'ws_out_gate': (NB, IV, H),             # shared_expert_gate [1, H]
        }

    def param_shapes(self) -> Dict[str, Any]:
        cfg = self.config
        NB, NLpb, IV = self.n_blocks, self.n_lin_per_block, self.interval
        H = cfg.hidden_size
        D = cfg.head_dim
        lin = {
            name: (NB, NLpb, H, out)
            for name, out in self._lin_in_shapes().items()
        }
        lin.update({
            'conv_w': (NB, NLpb, self.conv_dim, self.conv_k),
            'a_log': (NB, NLpb, self.lin_hv),
            'dt_bias': (NB, NLpb, self.lin_hv),
            'gate_norm': (NB, NLpb, self.lin_dv),
            'out_proj': (NB, NLpb, self.value_dim, H),
        })
        if self.conv_bias:
            lin['conv_b'] = (NB, NLpb, self.conv_dim)
        attn = {
            'wq': (NB, H, cfg.num_attention_heads * 2 * D),   # query | gate
            'wk': (NB, H, cfg.num_key_value_heads * D),
            'wv': (NB, H, cfg.num_key_value_heads * D),
            'wo': (NB, cfg.num_attention_heads * D, H),
            'q_norm': (NB, D),
            'k_norm': (NB, D),
        }
        mlp = self._mlp_shapes(NB, IV, H)
        blocks = {
            'attn_norms': (NB, IV, H),              # input layernorm per layer
            'mlp_norms': (NB, IV, H),               # post-attention layernorms
            **{f'lin_{k}': v for k, v in lin.items()},
            **{f'fa_{k}': v for k, v in attn.items()},
            **mlp,
        }
        shapes = {'embed': (cfg.vocab_size, H), 'blocks': blocks,
                  'final_norm': (H,)}
        if not cfg.tie_word_embeddings:
            shapes['lm_head'] = (H, cfg.vocab_size)
        return shapes

    def make_assign_plan(self):
        cfg = self.config
        IV = self.interval

        def T(x):
            return np.ascontiguousarray(np.swapaxes(x, -1, -2))

        def conv_w(x):   # [conv_dim, 1, K] -> [conv_dim, K]
            return np.ascontiguousarray(np.asarray(x)[:, 0, :])

        ident = lambda x: x  # noqa: E731
        # Qwen3NextRMSNorm is ZERO-CENTERED: the checkpoint stores w - 1 and
        # applies (1 + w) — fold the +1 at load (gemma-style); the GATED norm
        # (linear_attn.norm) uses the plain weight
        plus1 = lambda x: np.asarray(x, np.float32) + 1.0  # noqa: E731
        plan: Dict[str, Any] = {
            'model.embed_tokens.weight': (('embed',), ident, None),
            'model.norm.weight': (('final_norm',), plus1, None),
        }
        if not cfg.tie_word_embeddings:
            plan['lm_head.weight'] = (('lm_head',), T, None)

        for l in range(cfg.num_layers):
            blk, j = divmod(l, IV)
            p = f'model.layers.{l}.'
            plan[p + 'input_layernorm.weight'] = \
                (('blocks', 'attn_norms', blk, j), plus1, None)
            plan[p + 'post_attention_layernorm.weight'] = \
                (('blocks', 'mlp_norms', blk, j), plus1, None)
            if j < self.n_lin_per_block:       # linear-attention layer
                q = p + 'linear_attn.'
                self._plan_lin_in(plan, q, blk, j, T)
                plan[q + 'conv1d.weight'] = \
                    (('blocks', 'lin_conv_w', blk, j), conv_w, None)
                if self.conv_bias:
                    plan[q + 'conv1d.bias'] = \
                        (('blocks', 'lin_conv_b', blk, j), ident, None)
                plan[q + 'A_log'] = (('blocks', 'lin_a_log', blk, j), ident, None)
                plan[q + 'dt_bias'] = \
                    (('blocks', 'lin_dt_bias', blk, j), ident, None)
                plan[q + 'norm.weight'] = \
                    (('blocks', 'lin_gate_norm', blk, j), ident, None)
                plan[q + 'out_proj.weight'] = \
                    (('blocks', 'lin_out_proj', blk, j), T, None)
            else:                               # full-attention layer
                q = p + 'self_attn.'
                plan[q + 'q_proj.weight'] = (('blocks', 'fa_wq', blk), T, None)
                plan[q + 'k_proj.weight'] = (('blocks', 'fa_wk', blk), T, None)
                plan[q + 'v_proj.weight'] = (('blocks', 'fa_wv', blk), T, None)
                plan[q + 'o_proj.weight'] = (('blocks', 'fa_wo', blk), T, None)
                plan[q + 'q_norm.weight'] = \
                    (('blocks', 'fa_q_norm', blk), plus1, None)
                plan[q + 'k_norm.weight'] = \
                    (('blocks', 'fa_k_norm', blk), plus1, None)
            self._plan_mlp(plan, p + 'mlp.', blk, j, T)
        return plan

    def _plan_lin_in(self, plan, q: str, blk: int, j: int, T):
        """Assign-plan entries for one layer's DeltaNet input projections."""
        plan[q + 'in_proj_qkvz.weight'] = \
            (('blocks', 'lin_in_qkvz', blk, j), T, None)
        plan[q + 'in_proj_ba.weight'] = \
            (('blocks', 'lin_in_ba', blk, j), T, None)

    def _plan_mlp(self, plan, m: str, blk: int, j: int, T):
        """Assign-plan entries for one layer's (MoE) mlp."""
        plan[m + 'gate.weight'] = (('blocks', 'router', blk, j), T, None)
        for e in range(self.n_experts):
            x = m + f'experts.{e}.'
            plan[x + 'gate_proj.weight'] = \
                (('blocks', 'we_gate', blk, j), T, _ExpertSlice(e))
            plan[x + 'up_proj.weight'] = \
                (('blocks', 'we_up', blk, j), T, _ExpertSlice(e))
            plan[x + 'down_proj.weight'] = \
                (('blocks', 'we_down', blk, j), T, _ExpertSlice(e))
        plan[m + 'shared_expert.gate_proj.weight'] = \
            (('blocks', 'ws_gate', blk, j), T, None)
        plan[m + 'shared_expert.up_proj.weight'] = \
            (('blocks', 'ws_up', blk, j), T, None)
        plan[m + 'shared_expert.down_proj.weight'] = \
            (('blocks', 'ws_down', blk, j), T, None)
        plan[m + 'shared_expert_gate.weight'] = \
            (('blocks', 'ws_out_gate', blk, j),
             lambda x: np.asarray(x).reshape(-1), None)

    # -- sub-layers -----------------------------------------------------------------------
    def _delta_proj(self, w, j, x):
        """Input projections of one gated-DeltaNet layer.

        Returns (q [B,T,hk,dk], k [B,T,hk,dk], v [B,T,hv,dv], z [B,T,hv,dv],
        b [B,T,hv], a [B,T,hv]).  Qwen3-Next checkpoints fuse them as
        per-key-head [q|k|v|z] groups (in_proj_qkvz) + [b|a] pairs (in_proj_ba);
        Qwen3.5 splits them (models/qwen3_5.py overrides)."""
        B, T, _ = x.shape
        hk, hv, dk, dv, r = (self.lin_hk, self.lin_hv, self.lin_dk,
                             self.lin_dv, self.ratio)
        qkvz = jnp.dot(x, w['lin_in_qkvz'][j]).reshape(
            B, T, hk, 2 * dk + 2 * r * dv)
        ba = jnp.dot(x, w['lin_in_ba'][j]).reshape(B, T, hk, 2 * r)
        q = qkvz[..., :dk]
        k = qkvz[..., dk:2 * dk]
        v = qkvz[..., 2 * dk:2 * dk + r * dv].reshape(B, T, hv, dv)
        z = qkvz[..., 2 * dk + r * dv:].reshape(B, T, hv, dv)
        b = ba[..., :r].reshape(B, T, hv)
        a = ba[..., r:].reshape(B, T, hv)
        return q, k, v, z, b, a

    def _linear_attn(self, w, j, x, conv_st, rec_st, meta, valid, reset,
                     snaps: bool = False):
        """One gated-DeltaNet layer.  ``conv_st/rec_st`` are this layer's
        state rows gathered per batch row; returns (out, conv_st, rec_st
        [, (conv_snaps [B,T,K-1,C], rec_snaps [B,T,hv,dk,dv])]) — the
        per-position state snapshots speculative verification selects from
        after rejection (see spec_agent hybrid rollback)."""
        cfg = self.config
        B, T, H = x.shape
        hk, hv, dk, dv, r = (self.lin_hk, self.lin_hv, self.lin_dk,
                             self.lin_dv, self.ratio)
        q, k, v, z, b, a = self._delta_proj(w, j, x)

        # depthwise causal conv over [q | k | v] channels, state-continued
        mixed = jnp.concatenate(
            [q.reshape(B, T, -1), k.reshape(B, T, -1), v.reshape(B, T, -1)],
            axis=-1)
        reset3 = reset[:, None, None] if reset is not None else None
        if reset3 is not None:
            conv_st = jnp.where(reset3, 0, conv_st)
        conv_snaps = None
        if snaps:
            # conv state after position t = last K-1 inputs ending at t
            K = conv_st.shape[1] + 1
            full = jnp.concatenate([conv_st.astype(mixed.dtype), mixed],
                                   axis=1)
            win = (jnp.arange(T, dtype=jnp.int32)[:, None] + 1
                   + jnp.arange(K - 1, dtype=jnp.int32)[None, :])
            conv_snaps = full[:, win].astype(conv_st.dtype)  # [B,T,K-1,C]
        mixed, conv_st = causal_conv1d(
            mixed, conv_st, w['lin_conv_w'][j],
            w['lin_conv_b'][j] if 'lin_conv_b' in w else None, meta.q_lens)
        q = mixed[..., :self.key_dim].reshape(B, T, hk, dk)
        k = mixed[..., self.key_dim:2 * self.key_dim].reshape(B, T, hk, dk)
        v = mixed[..., 2 * self.key_dim:].reshape(B, T, hv, dv)

        g, beta = gate_decay(a, b, w['lin_a_log'][j], w['lin_dt_bias'][j])
        q = jnp.repeat(q, r, axis=2)
        k = jnp.repeat(k, r, axis=2)
        if reset is not None:
            rec_st = jnp.where(reset[:, None, None, None], 0.0, rec_st)
        if snaps:
            out, rec_st, rec_snaps = gated_delta_scan(
                q, k, v, g, beta, rec_st, valid=valid, return_states=True)
        else:
            out, rec_st = gated_delta_scan(q, k, v, g, beta, rec_st,
                                           valid=valid)

        # gated RMSNorm (norm-then-gate) + output projection
        of = out.astype(jnp.float32)
        of = of * jax.lax.rsqrt(
            jnp.mean(of * of, axis=-1, keepdims=True) + cfg.rms_norm_eps)
        of = of * w['lin_gate_norm'][j].astype(jnp.float32)
        of = of * jax.nn.silu(z.astype(jnp.float32))
        y = jnp.dot(of.reshape(B, T, hv * dv).astype(x.dtype),
                    w['lin_out_proj'][j])
        if snaps:
            return y, conv_st, rec_st, (conv_snaps, rec_snaps)
        return y, conv_st, rec_st

    def _moe(self, w, j, x):
        from ..ops.moe import eplb_remap, moe_ffn
        B, T, H = x.shape
        xf = x.reshape(B * T, H)
        logits = jnp.dot(xf, w['router'][j], preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1)
        top_w, top_idx = jax.lax.top_k(probs, self.top_k)
        if self.norm_topk:
            top_w = top_w / (top_w.sum(-1, keepdims=True) + 1e-20)
        out = moe_ffn(xf, top_idx, top_w, w['we_gate'][j], w['we_up'][j],
                      w['we_down'][j], x.dtype,
                      allow_ragged=not getattr(self, 'ep_sharded', False))
        s = jax.nn.silu(jnp.dot(xf, w['ws_gate'][j],
                                preferred_element_type=jnp.float32))
        s = s * jnp.dot(xf, w['ws_up'][j], preferred_element_type=jnp.float32)
        s = jnp.dot(s.astype(x.dtype), w['ws_down'][j],
                    preferred_element_type=jnp.float32)
        sg = jax.nn.sigmoid(jnp.dot(xf, w['ws_out_gate'][j],
                                    preferred_element_type=jnp.float32))
        out = out + s * sg[:, None]
        return out.reshape(B, T, H).astype(x.dtype)

    # -- forward --------------------------------------------------------------------------
    def forward(self, params, input_ids, positions, kv_cache, meta: AttnMeta,
                rope_cos, rope_sin, return_all_logits=False,
                fresh_prefill=False, input_embeds=None, embeds_mask=None,
                adapter_ids=None, return_hidden=False,
                return_state_snapshots=False):
        cfg = self.config
        B, T = input_ids.shape
        pages = kv_cache['pages']
        conv_all = kv_cache['conv']          # [n_lin, Bslots, K-1, conv_dim]
        rec_all = kv_cache['rec']            # [n_lin, Bslots, Hv, dk, dv]
        block_size = pages.shape[3]

        hidden = params['embed'][input_ids].astype(cfg.jnp_dtype())
        if input_embeds is not None:
            hidden = jnp.where(embeds_mask[..., None],
                               input_embeds.astype(hidden.dtype), hidden)
        cos, sin = self._gather_rope(rope_cos, rope_sin, positions)
        slot_mapping = compute_slot_mapping(meta.block_tables, meta.history_lens,
                                            meta.q_lens, T, block_size)
        slot_rows = meta.slot_rows if meta.slot_rows is not None \
            else jnp.arange(B, dtype=jnp.int32)
        reset = meta.reset_rows
        valid = (jnp.arange(T, dtype=jnp.int32)[None, :]
                 < meta.q_lens[:, None])

        NLpb = self.n_lin_per_block

        def block_fn(carry, w):
            h, pages, conv_all, rec_all, blk = carry
            conv_sn, rec_sn = [], []
            for j in range(NLpb):
                li = blk * NLpb + j
                x = rms_norm(h, w['attn_norms'][j], cfg.rms_norm_eps)
                conv_st = jax.lax.dynamic_index_in_dim(
                    conv_all, li, 0, False)[slot_rows]
                rec_st = jax.lax.dynamic_index_in_dim(
                    rec_all, li, 0, False)[slot_rows]
                out = self._linear_attn(
                    w, j, x, conv_st, rec_st, meta, valid, reset,
                    snaps=return_state_snapshots)
                if return_state_snapshots:
                    y, conv_st, rec_st, (csn, rsn) = out
                    conv_sn.append(csn)
                    rec_sn.append(rsn)
                else:
                    y, conv_st, rec_st = out
                conv_all = conv_all.at[li, slot_rows].set(conv_st)
                rec_all = rec_all.at[li, slot_rows].set(rec_st)
                h = h + y
                x = rms_norm(h, w['mlp_norms'][j], cfg.rms_norm_eps)
                h = h + self._moe(w, j, x)
            j = NLpb
            x = rms_norm(h, w['attn_norms'][j], cfg.rms_norm_eps)
            y, pages = self._full_attn(w, blk, x, pages, meta, cos, sin,
                                        slot_mapping, fresh_prefill)
            h = h + y
            x = rms_norm(h, w['mlp_norms'][j], cfg.rms_norm_eps)
            h = h + self._moe(w, j, x)
            ys = ((jnp.stack(conv_sn), jnp.stack(rec_sn))
                  if return_state_snapshots else None)
            return (h, pages, conv_all, rec_all, blk + 1), ys

        (hidden, pages, conv_all, rec_all, _), snaps = jax.lax.scan(
            block_fn, (hidden, pages, conv_all, rec_all, jnp.int32(0)),
            params['blocks'])
        if return_state_snapshots:
            # [NB, NLpb, B, T, ...] -> [n_lin, B, T, ...]
            snaps = {
                'conv': snaps[0].reshape((self.n_lin,) + snaps[0].shape[2:]),
                'rec': snaps[1].reshape((self.n_lin,) + snaps[1].shape[2:]),
            }
        out_cache = dict(kv_cache, pages=pages, conv=conv_all, rec=rec_all)

        hidden_prenorm = hidden
        hidden = rms_norm(hidden, params['final_norm'], cfg.rms_norm_eps)
        lm_head = params.get('lm_head')
        if lm_head is None:
            lm_head = params['embed'].T

        def head(x):
            return jnp.dot(x, lm_head, preferred_element_type=jnp.float32)

        if return_all_logits:
            if return_hidden and return_state_snapshots:
                return head(hidden), out_cache, hidden_prenorm, snaps
            if return_hidden:
                return head(hidden), out_cache, hidden_prenorm
            if return_state_snapshots:
                return head(hidden), out_cache, snaps
            return head(hidden), out_cache
        last_idx = jnp.maximum(meta.q_lens - 1, 0)
        last_hidden = jnp.take_along_axis(
            hidden, last_idx[:, None, None], axis=1)[:, 0]
        return head(last_hidden), out_cache

    def _full_attn(self, w, blk, x, pages, meta, cos, sin, slot_mapping,
                   fresh_prefill):
        cfg = self.config
        B, T, H = x.shape
        D = cfg.head_dim
        nh, nkv = cfg.num_attention_heads, cfg.num_key_value_heads
        qg = jnp.dot(x, w['fa_wq']).reshape(B, T, nh, 2 * D)
        q, gate = qg[..., :D], qg[..., D:]
        k = jnp.dot(x, w['fa_wk']).reshape(B, T, nkv, D)
        v = jnp.dot(x, w['fa_wv']).reshape(B, T, nkv, D)
        q = rms_norm(q, w['fa_q_norm'], cfg.rms_norm_eps)
        k = rms_norm(k, w['fa_k_norm'], cfg.rms_norm_eps)
        rdim = cfg.rope_dim
        q_rot, k_rot = apply_rope(q[..., :rdim], k[..., :rdim], cos, sin)
        q = jnp.concatenate([q_rot, q[..., rdim:]], axis=-1)
        k = jnp.concatenate([k_rot, k[..., rdim:]], axis=-1)

        pages = fill_kv_cache(pages, k.reshape(B * T, nkv, D),
                              v.reshape(B * T, nkv, D), slot_mapping, blk)
        attn = paged_attention(q, pages, meta.block_tables, meta.history_lens,
                               meta.q_lens, 1.0 / math.sqrt(D), blk, nkv,
                               chunk_kv=(k, v), fresh_prefill=fresh_prefill,
                               force_reference=getattr(
                                   self, 'force_ref_attention', False))
        attn = attn.reshape(B, T, nh * D)
        attn = attn * jax.nn.sigmoid(gate.reshape(B, T, nh * D)
                                     .astype(jnp.float32)).astype(attn.dtype)
        return jnp.dot(attn, w['fa_wo']), pages
