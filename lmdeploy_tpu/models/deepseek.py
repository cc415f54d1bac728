"""DeepSeek-V2/V3 family: Multi-head Latent Attention (MLA) + DeepSeek-MoE.

Reference analog: ``lmdeploy/pytorch/models/deepseek_v2.py`` (MLA forward,
absorbed projections) and TurboMind's MLA path.

TPU-first MLA design — one cache format, every attention path shared:

- The KV cache stores the COMPRESSED latent per token: ``[c_kv | k_rope]``
  (kv_lora_rank + qk_rope_head_dim, e.g. 512+64=576) under a single kv head.
  That is ~32x smaller than materialized per-head K/V for DeepSeek-V2
  geometry, so far more context fits in HBM.
- Attention always runs in ABSORBED form: q_nope is pushed through W_uk once
  (``q_c = q_nope @ W_uk``), so scores are plain dot products in latent space
  and the existing paged/flash kernels apply unchanged with n_heads query
  heads grouped over one kv head (MQA grouping).  The value payload is c_kv
  zero-padded to the key dim; the attention output's latent part is projected
  back through W_uv.  (The reference expands K/V for prefill to trade memory
  for fewer FLOPs; absorbed-everywhere keeps one cache format — an expanded
  prefill path is a later optimization.)
- Rope applies only to the rope sub-dimensions; tables are built for
  qk_rope_head_dim (config.rope_dim).  DeepSeek checkpoints store the rope
  dims interleaved — ``_deinterleave`` converts to the half-split layout
  before the standard rotation (HF modeling_deepseek does the same via a
  view/transpose).
- Layers come in two stacked groups scanned back to back: the first
  ``first_k_dense_replace`` layers with a dense MLP ('layers') and the rest
  with DeepSeek-MoE ('moe_layers': routed experts via the all-expert einsum
  combine from mixtral.py + always-on shared experts + routed scaling,
  group-limited n_group/topk_group routing — see _moe_mlp).
- Native blocked-fp8 checkpoints (V3): routed expert stacks stay fp8-resident
  ({'w8','gscale'} leaves, ops/pallas/quant_bmm.py); MLA projections
  dequantize at load.
"""
from __future__ import annotations

import math
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..nn.layers import apply_rope, rms_norm
from ..ops.attention import compute_slot_mapping, fill_kv_cache, paged_attention
from .llama import AttnMeta, LlamaModel


def _deinterleave(x: jax.Array) -> jax.Array:
    """[..., d] interleaved rope layout -> half-split layout (HF deepseek)."""
    *lead, d = x.shape
    return x.reshape(*lead, d // 2, 2).swapaxes(-1, -2).reshape(*lead, d)


class DeepseekV2Model(LlamaModel):

    # class default: subclasses that bypass this __init__ (glm4_moe) read it
    moe_fp8 = False
    """DeepSeek-V2 / V2-Lite / V3 decoder with MLA + MoE."""

    # muP-style hooks (MiniCPM3) — class-level so subclasses that bypass
    # __init__ (Glm4MoeModel) inherit the neutral defaults
    residual_scale = None
    logit_scale = None

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        cfg = config
        assert cfg.is_mla, 'DeepseekV2Model requires MLA config (kv_lora_rank)'
        self.nh = cfg.num_attention_heads
        self.dn = cfg.qk_nope_head_dim
        self.dr = cfg.qk_rope_head_dim
        self.dv = cfg.v_head_dim
        self.r = cfg.kv_lora_rank
        self.rq = cfg.q_lora_rank
        self.fk = cfg.first_k_dense_replace
        # attention scale uses the UNCOMPRESSED head dim (nope+rope), not the
        # latent dim the kernels see
        self.scale = 1.0 / math.sqrt(self.dn + self.dr)
        # Native blocked-fp8 checkpoints (DeepSeek-V3): the MLA projections
        # (custom reshaped/absorbed layouts) dequantize while streaming the
        # checkpoint, but the routed expert stacks — ~95% of V3's weights —
        # stay fp8-resident in HBM and dequantize tile-by-tile inside
        # ops/pallas/quant_bmm.py (reference analog: nn/moe/blocked_fp8.py).
        self.moe_fp8 = False
        if self.quant_method == 'fp8_blocked':
            import os
            self.quant_method = None
            self.dequant_on_load = True
            bK = getattr(self, 'fp8_block', (128, 128))[1]
            Ie = cfg.moe_intermediate_size or cfg.intermediate_size
            if (cfg.num_experts and cfg.hidden_size % bK == 0
                    and Ie % bK == 0
                    and os.environ.get('LMDEPLOY_TPU_FP8_DEQUANT') != '1'):
                self.moe_fp8 = True
                self.moe_fp8_block = bK
                self.keep_fp8 = lambda name: '.mlp.experts.' in name

    # -- parameter allocation ----------------------------------------------------------
    def _attn_shapes(self, L: int) -> Dict[str, Any]:
        cfg = self.config
        H = cfg.hidden_size
        nh, dn, dr, dv, r = self.nh, self.dn, self.dr, self.dv, self.r
        d = {
            'attn_norm': (L, H),
            'mlp_norm': (L, H),
            'wdkv': (L, H, r + dr),
            'kv_norm': (L, r),
            'wuk': (L, nh, dn, r),     # kv_b_proj K half, absorbed into q
            'wuv': (L, nh, r, dv),     # kv_b_proj V half, applied to attn out
            'wo': (L, nh * dv, H),
        }
        if self.rq:
            d.update(wdq=(L, H, self.rq), q_norm=(L, self.rq),
                     wuq=(L, self.rq, nh * (dn + dr)))
        else:
            d['wq'] = (L, H, nh * (dn + dr))
        return d

    def param_shapes(self) -> Dict[str, Any]:
        cfg = self.config
        L, H, V = cfg.num_layers, cfg.hidden_size, cfg.vocab_size
        fk = self.fk
        Lm = L - fk
        E = cfg.num_experts
        Ie = cfg.moe_intermediate_size or cfg.intermediate_size
        Is = (cfg.num_shared_experts or 0) * Ie
        shapes: Dict[str, Any] = {'embed': (V, H), 'final_norm': (H,)}
        if fk:
            dense = self._attn_shapes(fk)
            dense.update(w_gate=(fk, H, cfg.intermediate_size),
                         w_up=(fk, H, cfg.intermediate_size),
                         w_down=(fk, cfg.intermediate_size, H))
            shapes['layers'] = dense
        if Lm == 0:          # pure-MLA dense model (minicpm3)
            if not cfg.tie_word_embeddings:
                shapes['lm_head'] = (H, V)
            return shapes
        moe = self._attn_shapes(Lm)
        moe.update(router=(Lm, H, E),
                   router_bias=(Lm, E))       # v3 e_score_correction_bias
        if self.moe_fp8:
            import jax
            g = self.moe_fp8_block

            def qleaf(K, N):
                return {'w8': jax.ShapeDtypeStruct((Lm, E, K, N),
                                                   jnp.float8_e4m3fn),
                        'gscale': jax.ShapeDtypeStruct((Lm, E, K // g, N),
                                                       jnp.float32)}
            moe.update(we_gate=qleaf(H, Ie), we_up=qleaf(H, Ie),
                       we_down=qleaf(Ie, H))
        else:
            moe.update(we_gate=(Lm, E, H, Ie),
                       we_up=(Lm, E, H, Ie),
                       we_down=(Lm, E, Ie, H))
        if Is:
            moe.update(ws_gate=(Lm, H, Is), ws_up=(Lm, H, Is),
                       ws_down=(Lm, Is, H))
        shapes['moe_layers'] = moe
        if not cfg.tie_word_embeddings:
            shapes['lm_head'] = (H, V)
        return shapes

    # -- HF weight mapping -------------------------------------------------------------
    def make_assign_plan(self):
        cfg = self.config
        nh, dn, dr, dv, r = self.nh, self.dn, self.dr, self.dv, self.r
        fk = self.fk

        def T(x):
            return np.ascontiguousarray(np.swapaxes(x, -1, -2))

        def uk(x):   # [nh*(dn+dv), r] -> [nh, dn, r]
            return np.ascontiguousarray(x.reshape(nh, dn + dv, r)[:, :dn, :])

        def uv(x):   # [nh*(dn+dv), r] -> [nh, r, dv]
            return np.ascontiguousarray(
                np.swapaxes(x.reshape(nh, dn + dv, r)[:, dn:, :], -1, -2))

        ident = lambda x: x  # noqa: E731
        plan: Dict[str, Any] = {
            'model.embed_tokens.weight': (('embed',), ident, None),
            'model.norm.weight': (('final_norm',), ident, None),
        }
        if not cfg.tie_word_embeddings:
            plan['lm_head.weight'] = (('lm_head',), T, None)

        from .mixtral import _ExpertSlice
        for l in range(cfg.num_layers):
            grp = 'layers' if l < fk else 'moe_layers'
            i = l if l < fk else l - fk
            p = f'model.layers.{l}.'
            plan[p + 'input_layernorm.weight'] = ((grp, 'attn_norm', i), ident, None)
            plan[p + 'post_attention_layernorm.weight'] = \
                ((grp, 'mlp_norm', i), ident, None)
            plan[p + 'self_attn.kv_a_proj_with_mqa.weight'] = \
                ((grp, 'wdkv', i), T, None)
            plan[p + 'self_attn.kv_a_layernorm.weight'] = \
                ((grp, 'kv_norm', i), ident, None)
            plan[p + 'self_attn.kv_b_proj.weight'] = [
                ((grp, 'wuk', i), uk, None), ((grp, 'wuv', i), uv, None)]
            plan[p + 'self_attn.o_proj.weight'] = ((grp, 'wo', i), T, None)
            if self.rq:
                plan[p + 'self_attn.q_a_proj.weight'] = ((grp, 'wdq', i), T, None)
                plan[p + 'self_attn.q_a_layernorm.weight'] = \
                    ((grp, 'q_norm', i), ident, None)
                plan[p + 'self_attn.q_b_proj.weight'] = ((grp, 'wuq', i), T, None)
            else:
                plan[p + 'self_attn.q_proj.weight'] = ((grp, 'wq', i), T, None)
            if l < fk:
                plan[p + 'mlp.gate_proj.weight'] = ((grp, 'w_gate', i), T, None)
                plan[p + 'mlp.up_proj.weight'] = ((grp, 'w_up', i), T, None)
                plan[p + 'mlp.down_proj.weight'] = ((grp, 'w_down', i), T, None)
            else:
                plan[p + 'mlp.gate.weight'] = ((grp, 'router', i), T, None)
                plan[p + 'mlp.gate.e_score_correction_bias'] = \
                    ((grp, 'router_bias', i), ident, None)
                if self.moe_fp8:
                    g = self.moe_fp8_block
                    H = cfg.hidden_size
                    Ie = cfg.moe_intermediate_size or cfg.intermediate_size

                    def sc(n_out):
                        # HF scale_inv [ceil(N/g), ceil(K/g)] -> transpose,
                        # expand along N -> kernel scale rows [K/g, N]
                        def f(s):
                            sT = np.swapaxes(np.asarray(s, np.float32), -1, -2)
                            return np.repeat(sT, g, axis=-1)[..., :n_out]
                        return f
                    for e in range(cfg.num_experts):
                        q = p + f'mlp.experts.{e}.'
                        for hf, leaf, n_out in (('gate_proj', 'we_gate', Ie),
                                                ('up_proj', 'we_up', Ie),
                                                ('down_proj', 'we_down', H)):
                            plan[q + f'{hf}.weight'] = \
                                ((grp, leaf, 'w8', i), T, _ExpertSlice(e))
                            plan[q + f'{hf}.weight_scale_inv'] = \
                                ((grp, leaf, 'gscale', i), sc(n_out),
                                 _ExpertSlice(e))
                else:
                    for e in range(cfg.num_experts):
                        q = p + f'mlp.experts.{e}.'
                        plan[q + 'gate_proj.weight'] = ((grp, 'we_gate', i), T,
                                                        _ExpertSlice(e))
                        plan[q + 'up_proj.weight'] = ((grp, 'we_up', i), T,
                                                      _ExpertSlice(e))
                        plan[q + 'down_proj.weight'] = ((grp, 'we_down', i), T,
                                                        _ExpertSlice(e))
                if cfg.num_shared_experts:
                    q = p + 'mlp.shared_experts.'
                    plan[q + 'gate_proj.weight'] = ((grp, 'ws_gate', i), T, None)
                    plan[q + 'up_proj.weight'] = ((grp, 'ws_up', i), T, None)
                    plan[q + 'down_proj.weight'] = ((grp, 'ws_down', i), T, None)
        return plan

    # -- sharding ----------------------------------------------------------------------
    def make_shardings(self, shard_vocab: bool = True):
        """MLA sharding: q/absorbed projections over heads ('tp'); the latent
        cache has one kv head so it stays replicated across 'tp'; experts over
        ('ep','tp') as in mixtral."""
        from jax.sharding import PartitionSpec as P

        def attn(hasq):
            d = {
                'attn_norm': P(None, None), 'mlp_norm': P(None, None),
                'wdkv': P(None, None, None), 'kv_norm': P(None, None),
                'wuk': P(None, 'tp', None, None),
                'wuv': P(None, 'tp', None, None),
                'wo': P(None, 'tp', None),
            }
            if self.rq:
                d.update(wdq=P(None, None, None), q_norm=P(None, None),
                         wuq=P(None, None, 'tp'))
            else:
                d['wq'] = P(None, None, 'tp')
            return d

        shard: Dict[str, Any] = {'embed': P(None, None), 'final_norm': P(None)}
        if self.fk:
            dense = attn(True)
            dense.update(w_gate=P(None, None, 'tp'), w_up=P(None, None, 'tp'),
                         w_down=P(None, 'tp', None))
            shard['layers'] = dense
        if self.config.num_layers == self.fk:    # all-dense (minicpm3)
            if not self.config.tie_word_embeddings:
                shard['lm_head'] = P(None, 'tp') if shard_vocab \
                    else P(None, None)
            return shard
        moe = attn(True)
        moe.update(router=P(None, None, None), router_bias=P(None, None))
        if self.moe_fp8:
            gu = P(None, 'ep', None, 'tp')
            dn = P(None, 'ep', 'tp', None)
            moe.update(we_gate={'w8': gu, 'gscale': gu},
                       we_up={'w8': gu, 'gscale': gu},
                       we_down={'w8': dn, 'gscale': dn})
        else:
            moe.update(we_gate=P(None, 'ep', None, 'tp'),
                       we_up=P(None, 'ep', None, 'tp'),
                       we_down=P(None, 'ep', 'tp', None))
        if self.config.num_shared_experts:
            moe.update(ws_gate=P(None, None, 'tp'), ws_up=P(None, None, 'tp'),
                       ws_down=P(None, 'tp', None))
        shard['moe_layers'] = moe
        if not self.config.tie_word_embeddings:
            shard['lm_head'] = P(None, 'tp') if shard_vocab else P(None, None)
        return shard

    # -- forward -----------------------------------------------------------------------
    def _attn_block(self, h, w, layer, kv_cache, meta, cos, sin,
                    slot_mapping, fresh_prefill):
        cfg = self.config
        B, T = h.shape[0], h.shape[1]
        nh, dn, dr, dv, r = self.nh, self.dn, self.dr, self.dv, self.r
        D = r + dr
        from ..nn.linear import linear as proj

        x = rms_norm(h, w['attn_norm'], cfg.rms_norm_eps)
        if self.rq:
            q = proj(rms_norm(proj(x, w['wdq']), w['q_norm'], cfg.rms_norm_eps),
                     w['wuq'])
        else:
            q = proj(x, w['wq'])
        q = q.reshape(B, T, nh, dn + dr)
        q_nope, q_pe = q[..., :dn], q[..., dn:]

        ckv = proj(x, w['wdkv'])                                 # [B,T,r+dr]
        c, k_pe = ckv[..., :r], ckv[..., r:]
        c = rms_norm(c, w['kv_norm'], cfg.rms_norm_eps)
        q_pe, k_pe = apply_rope(_deinterleave(q_pe),
                                _deinterleave(k_pe)[:, :, None, :], cos, sin)

        # absorb W_uk into the query; keys/scores live in latent space
        q_c = jnp.einsum('btnd,ndr->btnr', q_nope.astype(jnp.float32),
                         w['wuk'].astype(jnp.float32)).astype(h.dtype)
        q_eff = jnp.concatenate([q_c, q_pe], axis=-1)            # [B,T,nh,D]
        k_new = jnp.concatenate([c, k_pe[:, :, 0]], axis=-1)     # [B,T,D]
        v_new = jnp.concatenate(
            [c, jnp.zeros((B, T, dr), c.dtype)], axis=-1)        # pad to D

        kv_cache = fill_kv_cache(
            kv_cache, k_new.reshape(B * T, 1, D),
            v_new.reshape(B * T, 1, D), slot_mapping, layer)
        attn = paged_attention(q_eff, kv_cache, meta.block_tables,
                               meta.history_lens, meta.q_lens, self.scale, layer,
                               1, window_size=None,
                               chunk_kv=(k_new[:, :, None, :], v_new[:, :, None, :]),
                               fresh_prefill=fresh_prefill,
                               force_reference=getattr(self, 'force_ref_attention', False))      # [B,T,nh,D]
        o = jnp.einsum('btnr,nrv->btnv', attn[..., :r].astype(jnp.float32),
                       w['wuv'].astype(jnp.float32)).astype(h.dtype)
        out = proj(o.reshape(B, T, nh * dv), w['wo'])
        if self.residual_scale is not None:
            out = out * jnp.asarray(self.residual_scale, out.dtype)
        h = h + out
        return h, kv_cache

    def _moe_mlp(self, w, x):
        cfg = self.config
        E, k = cfg.num_experts, cfg.num_experts_per_tok
        B, T, H = x.shape
        xf = x.reshape(B * T, H)
        logits = jnp.dot(xf, w['router'], preferred_element_type=jnp.float32)
        if cfg.scoring_func == 'sigmoid':                        # v3
            scores = jax.nn.sigmoid(logits)
            choice = scores + w['router_bias'][None, :]
        else:                                                    # v2 softmax
            scores = jax.nn.softmax(logits, axis=-1)
            choice = scores
        # group-limited routing: score groups (v3: sum of top-2 per group,
        # v2: group max), keep topk_group groups, mask the rest out of the
        # expert top-k (reference: deepseek_v2.py n_group/topk_group)
        ng, tg = cfg.n_group, cfg.topk_group
        if ng > 1 and 0 < tg < ng:
            gsz = E // ng
            grouped = choice.reshape(-1, ng, gsz)
            if cfg.scoring_func == 'sigmoid':
                g2, _ = jax.lax.top_k(grouped, min(2, gsz))
                gscore = g2.sum(-1)
            else:
                gscore = grouped.max(-1)
            _, gidx = jax.lax.top_k(gscore, tg)                  # [N, tg]
            gmask = jnp.zeros_like(gscore, dtype=bool)
            gmask = gmask.at[jnp.arange(gmask.shape[0])[:, None], gidx].set(True)
            # HF parity: sigmoid scores mask to 0.0 (deepseek_v3/glm4_moe
            # masked_fill(..., 0.0)); softmax scores mask to -inf
            fill = 0.0 if cfg.scoring_func == 'sigmoid' else -jnp.inf
            choice = jnp.where(jnp.repeat(gmask, gsz, axis=-1), choice, fill)
        _, top_idx = jax.lax.top_k(choice, k)
        top_w = jnp.take_along_axis(scores, top_idx, axis=-1)
        if cfg.norm_topk_prob:
            top_w = top_w / (top_w.sum(-1, keepdims=True) + 1e-20)
        top_w = top_w * cfg.routed_scaling_factor
        from ..ops.moe import eplb_remap, moe_ffn
        top_idx = eplb_remap(w, top_idx)
        out = moe_ffn(xf, top_idx, top_w, w['we_gate'], w['we_up'],
                      w['we_down'], x.dtype,
                      allow_ragged=not getattr(self, 'ep_sharded', False))
        if 'ws_gate' in w:                                       # shared experts
            s = jax.nn.silu(jnp.dot(xf, w['ws_gate'],
                                    preferred_element_type=jnp.float32))
            s = s * jnp.dot(xf, w['ws_up'], preferred_element_type=jnp.float32)
            out = out + jnp.dot(s.astype(x.dtype), w['ws_down'],
                                preferred_element_type=jnp.float32)
        return out.reshape(B, T, H).astype(x.dtype)

    # -- per-layer carry hooks (DSA index reuse rides the scan carry;
    #    see glm_moe_dsa.py) --------------------------------------------------------------
    def _init_dsa_carry(self, B, T, meta, block_size):
        return ()

    def _attn_block_x(self, h, w, layer, kv_cache, meta, cos, sin,
                      slot_mapping, fresh_prefill, extra):
        h, kv_cache = self._attn_block(h, w, layer, kv_cache, meta, cos, sin,
                                       slot_mapping, fresh_prefill)
        return h, kv_cache, extra

    def forward(self, params, input_ids, positions, kv_cache,
                meta: AttnMeta, rope_cos, rope_sin, return_all_logits=False,
                fresh_prefill=False, input_embeds=None, embeds_mask=None,
                adapter_ids=None,    # S-LoRA targets llama-family linears only
                return_hidden=False):
        cfg = self.config
        B, T = input_ids.shape
        block_size = kv_cache.shape[3]
        hidden = params['embed'][input_ids].astype(cfg.jnp_dtype())
        if self.embed_scale != 1.0:
            hidden = hidden * jnp.asarray(self.embed_scale, hidden.dtype)
        if input_embeds is not None:
            hidden = jnp.where(embeds_mask[..., None],
                               input_embeds.astype(hidden.dtype), hidden)
        cos = rope_cos[positions]
        sin = rope_sin[positions]
        slot_mapping = compute_slot_mapping(meta.block_tables, meta.history_lens,
                                            meta.q_lens, T, block_size)

        def make_layer_fn(moe: bool):
            def layer_fn(carry, w):
                h, kc, layer, extra = carry
                h, kc, extra = self._attn_block_x(h, w, layer, kc, meta, cos,
                                                  sin, slot_mapping,
                                                  fresh_prefill, extra)
                x = rms_norm(h, w['mlp_norm'], cfg.rms_norm_eps)
                out = self._moe_mlp(w, x) if moe \
                    else self._mlp(w, x)         # llama dense silu mlp
                if self.residual_scale is not None:
                    out = out * jnp.asarray(self.residual_scale, out.dtype)
                h = h + out
                return (h, kc, layer + 1, extra), None
            return layer_fn

        carry = (hidden, kv_cache, jnp.int32(0),
                 self._init_dsa_carry(B, T, meta, block_size))
        if 'layers' in params:
            carry, _ = jax.lax.scan(make_layer_fn(False), carry,
                                    params['layers'])
        if 'moe_layers' in params:
            carry, _ = jax.lax.scan(make_layer_fn(True), carry,
                                    params['moe_layers'])
        hidden, kv_cache = carry[0], carry[1]
        hidden_prenorm = hidden    # MTP/EAGLE condition on pre-norm features
        hidden = rms_norm(hidden, params['final_norm'], cfg.rms_norm_eps)

        lm_head = params.get('lm_head')
        if lm_head is None:
            lm_head = params['embed'].T

        def head(x):
            logits = jnp.dot(x, lm_head, preferred_element_type=jnp.float32)
            if self.logit_scale is not None:
                logits = logits * self.logit_scale
            return logits

        if return_all_logits:
            if return_hidden:
                return head(hidden), kv_cache, hidden_prenorm
            return head(hidden), kv_cache
        last_idx = jnp.maximum(meta.q_lens - 1, 0)
        last_hidden = jnp.take_along_axis(
            hidden, last_idx[:, None, None], axis=1)[:, 0]
        return head(last_hidden), kv_cache


class DeepseekMTP(DeepseekV2Model):
    """DeepSeek-V3 Multi-Token-Prediction module as a speculative proposer.

    Reference analog: ``lmdeploy/pytorch/spec_decode`` MTP proposers and the
    DeepSeek-V3 checkpoint's extra layer (``model.layers.{num_layers}``):
    the draft input is ``eh_proj([enorm(embed(tok)) ; hnorm(h_target)])``
    followed by ONE standard DeepSeek block (MLA attention + MoE), with the
    module's shared_head norm and the target's lm_head producing draft
    logits.  Embeddings and lm_head are shared with the target model, so the
    proposer adds only one layer of weights and one 1-layer latent KV cache.

    The ``step`` signature matches ``EagleHead.step`` — the engine reuses the
    feature-conditioned (EAGLE) speculative machinery, and batched rejection
    sampling keeps outputs exactly on the target distribution regardless of
    draft quality (see engine/spec_agent.py).
    """

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        # the MTP layer sits after the main stack; DeepSeek configs place it
        # past first_k_dense_replace, so its mlp is MoE whenever the model
        # has routed experts (tiny test configs without experts fall back to
        # the dense mlp)
        self.mtp_index = config.num_layers
        self.moe_mlp = bool(config.num_experts)

    # -- parameters ---------------------------------------------------------------------
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
            'enorm': (H,),
            'hnorm': (H,),
            'eh_proj': (2 * H, H),
            'shead_norm': (H,),
            'layer': layer,
        }

    def make_assign_plan(self):
        cfg = self.config
        nh, dn, dr, dv, r = self.nh, self.dn, self.dr, self.dv, self.r

        def T(x):
            return np.ascontiguousarray(np.swapaxes(x, -1, -2))

        def uk(x):
            return np.ascontiguousarray(x.reshape(nh, dn + dv, r)[:, :dn, :])

        def uv(x):
            return np.ascontiguousarray(
                np.swapaxes(x.reshape(nh, dn + dv, r)[:, dn:, :], -1, -2))

        ident = lambda x: x  # noqa: E731
        p = f'model.layers.{self.mtp_index}.'
        plan: Dict[str, Any] = {
            p + 'enorm.weight': (('enorm',), ident, None),
            p + 'hnorm.weight': (('hnorm',), ident, None),
            p + 'eh_proj.weight': (('eh_proj',), T, None),
            p + 'shared_head.norm.weight': (('shead_norm',), ident, None),
            p + 'input_layernorm.weight': (('layer', 'attn_norm', 0), ident, None),
            p + 'post_attention_layernorm.weight':
                (('layer', 'mlp_norm', 0), ident, None),
            p + 'self_attn.kv_a_proj_with_mqa.weight':
                (('layer', 'wdkv', 0), T, None),
            p + 'self_attn.kv_a_layernorm.weight':
                (('layer', 'kv_norm', 0), ident, None),
            p + 'self_attn.kv_b_proj.weight': [
                (('layer', 'wuk', 0), uk, None), (('layer', 'wuv', 0), uv, None)],
            p + 'self_attn.o_proj.weight': (('layer', 'wo', 0), T, None),
        }
        if self.rq:
            plan.update({
                p + 'self_attn.q_a_proj.weight': (('layer', 'wdq', 0), T, None),
                p + 'self_attn.q_a_layernorm.weight':
                    (('layer', 'q_norm', 0), ident, None),
                p + 'self_attn.q_b_proj.weight': (('layer', 'wuq', 0), T, None),
            })
        else:
            plan[p + 'self_attn.q_proj.weight'] = (('layer', 'wq', 0), T, None)
        if self.moe_mlp:
            from .mixtral import _ExpertSlice
            E = self.config.num_experts
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
            if self.config.num_shared_experts:
                q = p + 'mlp.shared_experts.'
                plan[q + 'gate_proj.weight'] = (('layer', 'ws_gate', 0), T, None)
                plan[q + 'up_proj.weight'] = (('layer', 'ws_up', 0), T, None)
                plan[q + 'down_proj.weight'] = (('layer', 'ws_down', 0), T, None)
        else:
            plan[p + 'mlp.gate_proj.weight'] = (('layer', 'w_gate', 0), T, None)
            plan[p + 'mlp.up_proj.weight'] = (('layer', 'w_up', 0), T, None)
            plan[p + 'mlp.down_proj.weight'] = (('layer', 'w_down', 0), T, None)
        return plan

    # -- draft step (EagleHead-compatible) ----------------------------------------------
    def step(self, params, tparams, h_cond, token, position, kv_cache,
             block_tables, q_lens, cos_tab, sin_tab, max_len):
        """One MTP draft step.

        Args: ``h_cond`` [B, H] target pre-final-norm features; ``token`` [B];
        ``position`` [B].  Returns (logits [B, V], h_new [B, H], kv_cache).
        """
        cfg = self.config
        B = token.shape[0]

        emb = tparams['embed'][token].astype(h_cond.dtype)           # [B, H]
        x = jnp.concatenate(
            [rms_norm(emb, params['enorm'], cfg.rms_norm_eps),
             rms_norm(h_cond, params['hnorm'], cfg.rms_norm_eps)],
            axis=-1) @ params['eh_proj']                             # [B, H]
        xt = x[:, None, :]

        pos = jnp.clip(position, 0, max_len - 1)[:, None]
        cos, sin = cos_tab[pos], sin_tab[pos]
        slot = compute_slot_mapping(block_tables, position, q_lens, 1,
                                    kv_cache.shape[3])
        w = jax.tree_util.tree_map(lambda a: a[0], params['layer'])
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
