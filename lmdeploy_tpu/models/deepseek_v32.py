"""DeepSeek-V3.2 (DSA — DeepSeek Sparse Attention).

Reference analog: ``lmdeploy/pytorch/models/deepseek_v32.py`` +
``kernels/cuda/ds_index.py`` (fp8_index) + ``backends/cuda/nsa.py``.

DSA = the V3 MLA stack where every attention layer first runs a cheap
"lightning indexer" over the whole history and then attends ONLY to the
top-``index_topk`` tokens per query:

  * indexer: ``q = wq_b(q_latent)`` (64 heads x 128), ``k = layernorm(wk(x))``
    (one 128-d key per token), rope on the first ``qk_rope_head_dim`` dims
    (same interleaved convention as the MLA rope), then a HADAMARD transform
    on both; per-query head weights ``w = weights_proj(x) * nh^-0.5``;
    score(t, s) = sum_h relu(q_th . k_s) * softmax_scale * w_th  — causal
    top-k indices (fill -1) select the tokens (reference ds_index.py:72-73);
  * sparse attention: the selected latent rows are GATHERED and attention
    runs dense over [topk] instead of the full history — on TPU this is one
    take_along_axis + the normal absorbed-MLA einsums, so decode cost is
    O(topk) not O(context);
  * the indexer's per-token key is cached INLINE with the latent KV: the K
    row layout is [c(r) | k_pe(dr) | idx_k(128)] (config.cache_extra_dim) —
    one page table, one scatter, one gather serve both.

TPU notes: the hadamard transform is a log2(d) butterfly (pure reshapes +
adds, XLA-fused); top-k uses jax.lax.top_k over the masked score row.  The
[B, T, topk] gather during prefill is memory-heavy for long chunks — the
engine's chunked prefill bounds T, and decode (T=1) is the steady state.
"""
from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..nn.layers import apply_rope, rms_norm
from ..ops.attention import fill_kv_cache
from .deepseek import DeepseekV2Model, _deinterleave


def hadamard_transform(x: jax.Array) -> jax.Array:
    """Fast Walsh-Hadamard transform over the last dim (power of 2),
    scaled by d^-0.5 (reference rotate_activation)."""
    d = x.shape[-1]
    assert d & (d - 1) == 0, d
    lead = x.shape[:-1]
    h = x.astype(jnp.float32)
    step = 1
    while step < d:
        h = h.reshape(*lead, d // (2 * step), 2, step)
        a, b = h[..., 0, :], h[..., 1, :]
        h = jnp.stack([a + b, a - b], axis=-2).reshape(*lead, d)
        step *= 2
    return (h * (d ** -0.5)).astype(x.dtype)


class DeepseekV32Model(DeepseekV2Model):
    """V3 MLA + MoE with DSA sparse attention layers."""

    def __init__(self, config: ModelConfig):
        hf = config.hf_config or {}
        self.idx_heads = int(hf.get('index_n_heads', 64))
        self.idx_dim = int(hf.get('index_head_dim', 128))
        self.idx_topk = int(hf.get('index_topk', 2048))
        config.cache_extra_dim = self.idx_dim
        super().__init__(config)
        self.idx_scale = self.idx_dim ** -0.5

    # -- parameters ----------------------------------------------------------------------
    def _attn_shapes(self, L: int) -> Dict[str, Any]:
        cfg = self.config
        H = cfg.hidden_size
        d = super()._attn_shapes(L)
        d.update({
            'idx_wq_b': (L, self.rq, self.idx_heads * self.idx_dim),
            'idx_wk': (L, H, self.idx_dim),
            'idx_k_norm': (L, self.idx_dim),
            'idx_k_norm_b': (L, self.idx_dim),
            'idx_weights': (L, H, self.idx_heads),
        })
        return d

    def make_assign_plan(self):
        cfg = self.config
        plan = super().make_assign_plan()

        def T(x):
            return np.ascontiguousarray(np.swapaxes(x, -1, -2))

        ident = lambda x: x  # noqa: E731
        fk = self.fk
        for l in range(cfg.num_layers):
            grp = 'layers' if l < fk else 'moe_layers'
            i = l if l < fk else l - fk
            p = f'model.layers.{l}.self_attn.indexer.'
            plan[p + 'wq_b.weight'] = ((grp, 'idx_wq_b', i), T, None)
            plan[p + 'wk.weight'] = ((grp, 'idx_wk', i), T, None)
            plan[p + 'k_norm.weight'] = ((grp, 'idx_k_norm', i), ident, None)
            plan[p + 'k_norm.bias'] = ((grp, 'idx_k_norm_b', i), ident, None)
            plan[p + 'weights_proj.weight'] = \
                ((grp, 'idx_weights', i), T, None)
        return plan

    # -- DSA attention block ---------------------------------------------------------------
    def _attn_block(self, h, w, layer, kv_cache, meta, cos, sin,
                    slot_mapping, fresh_prefill):
        """Carry-free entry (MTP draft step); the scan uses _attn_block_x."""
        B, T = h.shape[0], h.shape[1]
        bs = kv_cache.shape[3]
        h, kv_cache, _ = self._attn_block_x(
            h, w, layer, kv_cache, meta, cos, sin, slot_mapping,
            fresh_prefill, self._init_dsa_carry(B, T, meta, bs))
        return h, kv_cache

    def _indexer_rope_q(self, iq_pe, cos, sin):
        """DeepSeek checkpoints use the interleaved (complex) convention."""
        d = _deinterleave(iq_pe)
        return apply_rope(d, d, cos, sin)[0]

    def _indexer_rope_k(self, ik_pe, cos, sin):
        d = _deinterleave(ik_pe)[:, :, None, :]
        return apply_rope(d, d, cos, sin)[0]

    def _dsa_select(self, x, qr, w, cos, sin, hist_k, causal, layer, extra):
        """Lightning-indexer scoring + causal top-k (reference ds_index.py).

        Returns (top_idx [B,T,K], valid [B,T,K], extra) — subclasses may reuse
        a previous layer's indices through ``extra`` (GLM-5.2 'shared' layers).
        """
        dr, Di = self.dr, self.idx_dim
        S = hist_k.shape[1]
        from ..nn.linear import linear as proj
        iq = proj(qr, w['idx_wq_b']).reshape(
            qr.shape[0], qr.shape[1], self.idx_heads, Di)
        iq_pe, iq_nope = iq[..., :dr], iq[..., dr:]
        iq_pe = self._indexer_rope_q(iq_pe, cos, sin)
        iq = hadamard_transform(
            jnp.concatenate([iq_pe, iq_nope], axis=-1))          # [B,T,hI,Di]
        iw = (proj(x, w['idx_weights'])
              * (self.idx_heads ** -0.5)).astype(jnp.float32)     # [B,T,hI]
        # score(t,s) = sum_h relu(q.k) * scale * w  (ds_index.py:72-73)
        logits = jnp.einsum('bthd,bsd->bhts', iq.astype(jnp.float32),
                            hist_k.astype(jnp.float32))
        scores = jnp.einsum('bhts,bth->bts', jnp.maximum(logits, 0.0),
                            iw * self.idx_scale)                 # [B,T,S]
        scores = jnp.where(causal, scores, -jnp.inf)
        K = min(self.idx_topk, S)
        top_scores, top_idx = jax.lax.top_k(scores, K)           # [B,T,K]
        valid = jnp.isfinite(top_scores)                         # in-range
        return top_idx, valid, extra

    def _attn_block_x(self, h, w, layer, kv_cache, meta, cos, sin,
                      slot_mapping, fresh_prefill, extra):
        cfg = self.config
        B, T = h.shape[0], h.shape[1]
        nh, dn, dr, dv, r = self.nh, self.dn, self.dr, self.dv, self.r
        D = r + dr
        Di = self.idx_dim
        from ..nn.linear import linear as proj

        x = rms_norm(h, w['attn_norm'], cfg.rms_norm_eps)
        # q latent (v3.2 always has q_lora)
        qr = rms_norm(proj(x, w['wdq']), w['q_norm'], cfg.rms_norm_eps)
        q = proj(qr, w['wuq']).reshape(B, T, nh, dn + dr)
        q_nope, q_pe = q[..., :dn], q[..., dn:]

        ckv = proj(x, w['wdkv'])                                 # [B,T,r+dr]
        c, k_pe = ckv[..., :r], ckv[..., r:]
        c = rms_norm(c, w['kv_norm'], cfg.rms_norm_eps)
        q_pe, k_pe = apply_rope(_deinterleave(q_pe),
                                _deinterleave(k_pe)[:, :, None, :], cos, sin)

        # ---- lightning indexer keys (cached inline with the latents) ---------
        ik = proj(x, w['idx_wk'])                                # [B,T,Di]
        ikf = ik.astype(jnp.float32)
        mu = ikf.mean(-1, keepdims=True)
        var = ((ikf - mu) ** 2).mean(-1, keepdims=True)
        ik = ((ikf - mu) * jax.lax.rsqrt(var + 1e-6) * w['idx_k_norm']
              + w['idx_k_norm_b']).astype(ik.dtype)
        ik_pe, ik_nope = ik[..., :dr], ik[..., dr:]
        ik_pe = self._indexer_rope_k(ik_pe, cos, sin)
        ik = hadamard_transform(
            jnp.concatenate([ik_pe[:, :, 0], ik_nope], axis=-1))  # [B,T,Di]

        # absorbed query + cache rows: [c | k_pe | idx_k]
        q_c = jnp.einsum('btnd,ndr->btnr', q_nope.astype(jnp.float32),
                         w['wuk'].astype(jnp.float32)).astype(h.dtype)
        q_eff = jnp.concatenate([q_c, q_pe], axis=-1)            # [B,T,nh,D]
        k_new = jnp.concatenate([c, k_pe[:, :, 0], ik], axis=-1)  # [B,T,D+Di]
        v_new = jnp.zeros_like(k_new)

        kv_cache = fill_kv_cache(
            kv_cache, k_new.reshape(B * T, 1, D + Di),
            v_new.reshape(B * T, 1, D + Di), slot_mapping, layer)

        # ---- gather the K plane once: latents + indexer keys -----------------
        from ..ops.attention import gather_layer_kv
        keys, _ = gather_layer_kv(kv_cache, layer, meta.block_tables, 1,
                                  D + Di)                       # [1,B,S,HDp]
        keys = keys[0]                                           # [B,S,HDp]
        S = keys.shape[1]
        hist_k = keys[..., D:D + Di]                             # [B,S,Di]

        pos_q = (meta.history_lens[:, None]
                 + jnp.arange(T, dtype=jnp.int32)[None])         # [B,T]
        pos_k = jnp.arange(S, dtype=jnp.int32)[None]             # [1,S]
        causal = pos_k[:, None, :] <= pos_q[:, :, None]          # [B,T,S]

        top_idx, valid, extra = self._dsa_select(x, qr, w, cos, sin, hist_k,
                                                 causal, layer, extra)

        # ---- sparse absorbed-MLA attention over the selected rows -------------
        sel = jnp.take_along_axis(
            keys[:, None, :, :D], top_idx[..., None], axis=2)    # [B,T,K,D]
        att = jnp.einsum('btnd,btkd->bntk', q_eff.astype(jnp.float32),
                         sel.astype(jnp.float32)) * self.scale
        att = jnp.where(valid[:, None], att, -1e30)
        p = jax.nn.softmax(att, axis=-1)
        o = jnp.einsum('bntk,btkr->btnr', p,
                       sel[..., :r].astype(jnp.float32))         # [B,T,nh,r]
        o = jnp.einsum('btnr,nrv->btnv', o,
                       w['wuv'].astype(jnp.float32)).astype(h.dtype)
        out = proj(o.reshape(B, T, nh * dv), w['wo'])
        if self.residual_scale is not None:
            out = out * jnp.asarray(self.residual_scale, out.dtype)
        return h + out, kv_cache, extra
