"""DeepSeek-V4: NSA-style sparse attention with compressed KV + windows.

Reference analog: ``lmdeploy/pytorch/models/deepseek_v4.py`` (+ the kernel
semantics in ``kernels/cuda/v4_compressor.py``, ``backends/cuda/attention/
v4.py``, ``backends/cuda/v4_indexer.py``, ``kernels/cuda/dsv4/
hc_split_sinkhorn.py``).  Per layer:

  * **MQA attention**: ``n_heads`` queries against ONE shared per-token kv
    vector (K == V == ``kv_norm(wkv(x))``), rope (complex/interleaved pairs)
    on the last ``qk_rope_head_dim`` dims, per-head ``attn_sink`` logits, and
    an INVERSE rope on the output's rope dims before the grouped output
    projection ``wo_b(bmm(wo_a))``.
  * **Sliding window**: raw KV attends only within ``sliding_window`` — the
    raw rows live in the normal paged cache (1 kv head), so the scheduler's
    out-of-window block freeing applies; long-range context survives only in
    compressed form.
  * **Compressed KV** (``compress_ratios[l]`` in {0, 4, 128}): every
    ``ratio`` tokens the compressor pools a window of projected rows with a
    CHANNEL-WISE softmax over ``wgate(x) + ape[pos % ratio]`` — ratio 4 uses
    two overlapping sub-windows (prev tokens contribute their LEFT half
    channels, current tokens their RIGHT half; one softmax over 2*ratio
    rows), ratio 128 a single window.  Pooled rows are RMS-normed, roped at
    the compressed position with a separate YaRN table
    (``compress_rope_theta``), and appended to a per-slot buffer.  A ring of
    the last ``2*ratio`` projected rows rides the cache pytree so chunked
    prefill/decode compress across chunk boundaries exactly.
  * **Indexer** (ratio-4 layers): an FP8-index-style scorer —
    ``sum_h relu(iq_h . ick_c) * w_h`` over hadamard-rotated queries and a
    second (rotated) compressed stream — selects ``index_topk`` compressed
    rows; ratio-128 layers attend ALL compressed rows.  One softmax spans
    [selected compressed rows | window raw rows | sink].
  * **Hyper-connections** (``hc_mult`` residual streams): each sublayer
    reduces the streams with sigmoid ``pre`` weights, and re-expands with
    ``post`` + a Sinkhorn-normalized ``comb`` mixing matrix
    (``hc_split_sinkhorn``); the lm head reduces with its own ``pre``.
  * **MoE**: the first ``num_hash_layers`` layers route by TOKEN ID through
    the ``tid2eid`` lookup table; later layers use biased top-k over
    softmax/sigmoid/softplus-sqrt scores; experts use the ``swiglu_limit``
    clamped activation; plus one shared expert.

TPU-first shape: raw KV rides the existing paged cache + window machinery;
compressed buffers and compressor rings ride the cache pytree like the
gated-DeltaNet states (``has_linear_state``), donated through every step.
Layers are heterogeneous (per-layer ratios), so the decoder is an unrolled
loop over per-layer param dicts rather than a stacked ``lax.scan``.
Attention uses the gathered XLA path (exact); a fused Pallas decode kernel
is a future optimization.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..nn.layers import make_rope_table, rms_norm
from ..ops.attention import (compute_slot_mapping, fill_kv_cache,
                             gather_layer_kv)
from .deepseek_v32 import hadamard_transform
from .llama import AttnMeta, LlamaModel

NEG = jnp.float32(-1e30)


def rope_complex(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Interleaved-pair rotation: pairs (x_2i, x_2i+1), cos/sin [..., d/2]
    (reference apply_rotary_pos_emb.py COMPLEX=True)."""
    shape = x.shape
    x2 = x.astype(jnp.float32).reshape(shape[:-1] + (shape[-1] // 2, 2))
    xl, xh = x2[..., 0], x2[..., 1]
    yl = xl * cos - xh * sin
    yh = xh * cos + xl * sin
    return jnp.stack([yl, yh], axis=-1).reshape(shape).astype(x.dtype)


def rms_scale(a: jax.Array, b: jax.Array, eps: float) -> jax.Array:
    """a * rsqrt(mean(b^2, -1) + eps), f32 math (reference nn/norm.py:14)."""
    af = a.astype(jnp.float32)
    bf = b.astype(jnp.float32)
    return af * jax.lax.rsqrt(jnp.mean(bf * bf, axis=-1, keepdims=True) + eps)


class DeepseekV4Model(LlamaModel):
    """DeepSeek-V4 decoder (hc streams + NSA sparse attention + hash MoE)."""

    has_linear_state = True

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        cfg = config
        hf = cfg.hf_config or {}
        L = cfg.num_layers
        self.D = cfg.head_dim
        self.nh = cfg.num_attention_heads
        self.rd = hf.get('qk_rope_head_dim', 64)
        self.q_rank = hf.get('q_lora_rank', 1536)
        self.o_groups = hf.get('o_groups', 1)
        self.o_rank = hf.get('o_lora_rank', cfg.hidden_size)
        self.window = hf.get('sliding_window') or cfg.max_position_embeddings
        ratios = list(hf.get('compress_ratios') or [])
        ratios = (ratios + [0] * L)[:L]
        self.ratios = ratios
        # position of each layer within its ratio-group's state buffers.
        # ratio 4 = overlapping compressor + indexer; any other nonzero
        # ratio = non-overlap full-prefix compressed attention (128 in real
        # checkpoints; parametric here so tiny tests can exercise it)
        self.r4_pos = {l: i for i, l in
                       enumerate(j for j in range(L) if ratios[j] == 4)}
        others = sorted({r for r in ratios if r not in (0, 4)})
        assert len(others) <= 1, f'mixed non-overlap ratios: {others}'
        self.rn = others[0] if others else 128
        self.rn_pos = {l: i for i, l in
                       enumerate(j for j in range(L) if ratios[j] == self.rn
                                 and ratios[j] != 0)}
        self.idx_heads = hf.get('index_n_heads', 32)
        self.idx_dim = hf.get('index_head_dim', 128)
        self.idx_topk = hf.get('index_topk', 2048)
        self.hc = hf.get('hc_mult', 4)
        self.hc_iters = hf.get('hc_sinkhorn_iters', 20)
        self.hc_eps = hf.get('hc_eps', 1e-6)
        self.n_hash = hf.get('num_hash_layers', 0)
        self.score_func = hf.get('scoring_func', 'sigmoid')
        self.route_scale = hf.get('routed_scaling_factor', 1.0)
        self.swiglu_limit = hf.get('swiglu_limit', 0.0) or 0.0
        self.n_experts = cfg.num_experts
        self.top_k = cfg.num_experts_per_tok
        self.moe_inter = cfg.moe_intermediate_size or cfg.intermediate_size
        self.n_shared = hf.get('n_shared_experts', 1)
        self.scale = self.D ** -0.5

        # rope tables (complex mode indexes [pos, rd/2] directly).  Plain
        # table for ratio-0 layers; a YaRN table with compress_rope_theta for
        # compressed layers AND compressed-row positions, mscale disabled
        # (reference builds rotary_emb_plain / rotary_emb_compress with
        # attention_factor=1.0).
        scaling = hf.get('rope_scaling') or {}
        M = cfg.max_position_embeddings
        self._plain = make_rope_table(self.rd, M, cfg.rope_theta)
        self._compress_rope = make_rope_table(
            self.rd, M, hf.get('compress_rope_theta', cfg.rope_theta),
            {'rope_type': 'yarn',
             'factor': scaling.get('factor', 1.0),
             'original_max_position_embeddings': scaling.get(
                 'original_max_position_embeddings', M),
             'beta_fast': scaling.get('beta_fast', 32),
             'beta_slow': scaling.get('beta_slow', 1),
             'mscale': 0})

    # -- state buffers carried with the cache --------------------------------------------
    def state_shapes(self, num_slots: int) -> Dict[str, Any]:
        cfg = self.config
        dt = cfg.jnp_dtype()
        M = getattr(self, 'max_model_len', cfg.max_position_embeddings)
        n4, n128 = len(self.r4_pos), len(self.rn_pos)
        D, Di = self.D, self.idx_dim
        shapes: Dict[str, Any] = {}
        if n4:
            M4 = max(M // 4, 1)
            shapes.update({
                # compressor rings: last 2*ratio projected rows (kv, score)
                'c4_kv': jax.ShapeDtypeStruct((n4, num_slots, 8, 2 * D),
                                              jnp.float32),
                'c4_sc': jax.ShapeDtypeStruct((n4, num_slots, 8, 2 * D),
                                              jnp.float32),
                'i4_kv': jax.ShapeDtypeStruct((n4, num_slots, 8, 2 * Di),
                                              jnp.float32),
                'i4_sc': jax.ShapeDtypeStruct((n4, num_slots, 8, 2 * Di),
                                              jnp.float32),
                # emitted compressed rows (attention stream + rotated
                # indexer stream)
                'ckv4': jax.ShapeDtypeStruct((n4, num_slots, M4, D), dt),
                'ickv4': jax.ShapeDtypeStruct((n4, num_slots, M4, Di), dt),
            })
        if n128:
            rn = self.rn
            M128 = max(M // rn, 1)
            shapes.update({
                'c128_kv': jax.ShapeDtypeStruct((n128, num_slots, rn, D),
                                                jnp.float32),
                'c128_sc': jax.ShapeDtypeStruct((n128, num_slots, rn, D),
                                                jnp.float32),
                'ckv128': jax.ShapeDtypeStruct((n128, num_slots, M128, D),
                                               dt),
            })
        return shapes

    # -- parameters -----------------------------------------------------------------------
    def param_shapes(self) -> Dict[str, Any]:
        cfg = self.config
        H = cfg.hidden_size
        D, Di, rd = self.D, self.idx_dim, self.rd
        nh, g = self.nh, self.o_groups
        hc, mix = self.hc, (2 + self.hc) * self.hc
        E, I = self.n_experts, self.moe_inter
        layers: Dict[str, Any] = {}
        for l in range(cfg.num_layers):
            r = self.ratios[l]
            lw: Dict[str, Any] = {
                'wq_a': (H, self.q_rank), 'q_norm': (self.q_rank,),
                'wq_b': (self.q_rank, nh * D),
                'wkv': (H, D), 'kv_norm': (D,),
                'wo_a': (g, nh * D // g, self.o_rank),
                'wo_b': (g * self.o_rank, H),
                'sink': jax.ShapeDtypeStruct((nh,), jnp.float32),
                'attn_norm': (H,), 'ffn_norm': (H,),
                'hc_attn_fn': jax.ShapeDtypeStruct((mix, hc * H),
                                                   jnp.float32),
                'hc_ffn_fn': jax.ShapeDtypeStruct((mix, hc * H),
                                                  jnp.float32),
                'hc_attn_base': jax.ShapeDtypeStruct((mix,), jnp.float32),
                'hc_ffn_base': jax.ShapeDtypeStruct((mix,), jnp.float32),
                'hc_attn_scale': jax.ShapeDtypeStruct((3,), jnp.float32),
                'hc_ffn_scale': jax.ShapeDtypeStruct((3,), jnp.float32),
                # moe
                'gate_w': (H, E),
                'we_gate': (E, H, I), 'we_up': (E, H, I), 'we_down': (E, I, H),
                'ws_gate': (H, I * self.n_shared),
                'ws_up': (H, I * self.n_shared),
                'ws_down': (I * self.n_shared, H),
            }
            if l < self.n_hash:
                lw['tid2eid'] = jax.ShapeDtypeStruct(
                    (cfg.vocab_size, self.top_k), jnp.int32)
            else:
                lw['gate_bias'] = jax.ShapeDtypeStruct((E,), jnp.float32)
            if r:
                coff = 2 if r == 4 else 1
                lw.update({
                    'c_ape': jax.ShapeDtypeStruct((r, coff * D), jnp.float32),
                    'c_wkv': (H, coff * D), 'c_wgate': (H, coff * D),
                    'c_norm': (D,),
                })
            if r == 4:
                lw.update({
                    'i_wq_b': (self.q_rank, self.idx_heads * Di),
                    'i_weights': (H, self.idx_heads),
                    'i_ape': jax.ShapeDtypeStruct((4, 2 * Di), jnp.float32),
                    'i_wkv': (H, 2 * Di), 'i_wgate': (H, 2 * Di),
                    'i_norm': (Di,),
                })
            layers[str(l)] = lw
        return {
            'embed': (cfg.vocab_size, H),
            'final_norm': (H,),
            'lm_head': (H, cfg.vocab_size),
            'hc_head_fn': jax.ShapeDtypeStruct((hc, hc * H), jnp.float32),
            'hc_head_base': jax.ShapeDtypeStruct((hc,), jnp.float32),
            'hc_head_scale': jax.ShapeDtypeStruct((1,), jnp.float32),
            'layers': layers,
        }

    def make_assign_plan(self):
        cfg = self.config
        g = self.o_groups

        def T(x):
            return np.ascontiguousarray(np.swapaxes(x, -1, -2))

        def wo_a(x):   # [g*o_rank, nh*D/g] -> [g, nh*D/g, o_rank]
            x = np.asarray(x).reshape(g, self.o_rank, -1)
            return np.ascontiguousarray(np.swapaxes(x, -1, -2))

        ident = lambda x: x  # noqa: E731
        plan: Dict[str, Any] = {
            'embed.weight': (('embed',), ident, None),
            'norm.weight': (('final_norm',), ident, None),
            'head.weight': (('lm_head',), T, None),
            'hc_head_fn': (('hc_head_fn',), ident, None),
            'hc_head_base': (('hc_head_base',), ident, None),
            'hc_head_scale': (('hc_head_scale',), ident, None),
        }
        from .mixtral import _ExpertSlice
        for l in range(cfg.num_layers):
            p = f'layers.{l}.'
            lw = ('layers', str(l))
            a = p + 'attn.'
            plan[a + 'wq_a.weight'] = (lw + ('wq_a',), T, None)
            plan[a + 'q_norm.weight'] = (lw + ('q_norm',), ident, None)
            plan[a + 'wq_b.weight'] = (lw + ('wq_b',), T, None)
            plan[a + 'wkv.weight'] = (lw + ('wkv',), T, None)
            plan[a + 'kv_norm.weight'] = (lw + ('kv_norm',), ident, None)
            plan[a + 'wo_a.weight'] = (lw + ('wo_a',), wo_a, None)
            plan[a + 'wo_b.weight'] = (lw + ('wo_b',), T, None)
            plan[a + 'attn_sink'] = (lw + ('sink',), ident, None)
            if self.ratios[l]:
                c = a + 'compressor.'
                plan[c + 'ape'] = (lw + ('c_ape',), ident, None)
                plan[c + 'wkv.weight'] = (lw + ('c_wkv',), T, None)
                plan[c + 'wgate.weight'] = (lw + ('c_wgate',), T, None)
                plan[c + 'norm.weight'] = (lw + ('c_norm',), ident, None)
            if self.ratios[l] == 4:
                i = a + 'indexer.'
                plan[i + 'wq_b.weight'] = (lw + ('i_wq_b',), T, None)
                plan[i + 'weights_proj.weight'] = \
                    (lw + ('i_weights',), T, None)
                ic = i + 'compressor.'
                plan[ic + 'ape'] = (lw + ('i_ape',), ident, None)
                plan[ic + 'wkv.weight'] = (lw + ('i_wkv',), T, None)
                plan[ic + 'wgate.weight'] = (lw + ('i_wgate',), T, None)
                plan[ic + 'norm.weight'] = (lw + ('i_norm',), ident, None)
            f = p + 'ffn.'
            plan[f + 'gate.weight'] = (lw + ('gate_w',), T, None)
            if l < self.n_hash:
                plan[f + 'gate.tid2eid'] = (lw + ('tid2eid',), ident, None)
                # some checkpoints misspell the table (reference
                # load_weights renames tie2eid -> tid2eid)
                plan[f + 'gate.tie2eid'] = (lw + ('tid2eid',), ident, None)
            else:
                plan[f + 'gate.bias'] = (lw + ('gate_bias',), ident, None)
            for e in range(self.n_experts):
                q = f + f'experts.{e}.'
                plan[q + 'w1.weight'] = (lw + ('we_gate',), T,
                                         _ExpertSlice(e))
                plan[q + 'w3.weight'] = (lw + ('we_up',), T, _ExpertSlice(e))
                plan[q + 'w2.weight'] = (lw + ('we_down',), T,
                                         _ExpertSlice(e))
            s = f + 'shared_experts.'
            plan[s + 'w1.weight'] = (lw + ('ws_gate',), T, None)
            plan[s + 'w3.weight'] = (lw + ('ws_up',), T, None)
            plan[s + 'w2.weight'] = (lw + ('ws_down',), T, None)
            plan[p + 'attn_norm.weight'] = (lw + ('attn_norm',), ident, None)
            plan[p + 'ffn_norm.weight'] = (lw + ('ffn_norm',), ident, None)
            for nm in ('hc_attn_fn', 'hc_ffn_fn', 'hc_attn_base',
                       'hc_ffn_base', 'hc_attn_scale', 'hc_ffn_scale'):
                plan[p + nm] = (lw + (nm,), ident, None)
        return plan

    # -- hyper-connections ------------------------------------------------------------------
    def _hc_pre(self, x, fn, scale, base):
        """x [B,T,hc,H] -> (reduced [B,T,H], post [B,T,hc], comb
        [B,T,hc,hc]).  Reference hc_split_sinkhorn + hc_pre_reduce."""
        cfg = self.config
        hc, eps = self.hc, self.hc_eps
        B, Tn = x.shape[0], x.shape[1]
        xf = x.astype(jnp.float32).reshape(B, Tn, hc * x.shape[-1])
        mix = rms_scale(jnp.dot(xf, fn.T), xf, cfg.rms_norm_eps)
        pre = jax.nn.sigmoid(mix[..., :hc] * scale[0] + base[:hc]) + eps
        post = 2.0 * jax.nn.sigmoid(mix[..., hc:2 * hc] * scale[1]
                                    + base[hc:2 * hc])
        comb = (mix[..., 2 * hc:] * scale[2]
                + base[2 * hc:]).reshape(B, Tn, hc, hc)
        comb = jax.nn.softmax(comb, axis=-1) + eps
        comb = comb / (comb.sum(-2, keepdims=True) + eps)
        for _ in range(self.hc_iters - 1):
            comb = comb / (comb.sum(-1, keepdims=True) + eps)
            comb = comb / (comb.sum(-2, keepdims=True) + eps)
        y = jnp.sum(pre[..., None] * x.astype(jnp.float32), axis=2)
        return y.astype(x.dtype), post, comb

    def _hc_post(self, y, residual, post, comb):
        """y [B,T,H] + residual [B,T,hc,H] -> [B,T,hc,H]."""
        out = (post[..., None] * y.astype(jnp.float32)[..., None, :]
               + jnp.einsum('btos,btsh->btoh', comb,
                            residual.astype(jnp.float32)))
        return out.astype(residual.dtype)

    def _hc_head(self, x, params):
        cfg = self.config
        B, Tn = x.shape[0], x.shape[1]
        xf = x.astype(jnp.float32).reshape(B, Tn, -1)
        mix = rms_scale(jnp.dot(xf, params['hc_head_fn'].T), xf,
                        cfg.rms_norm_eps)
        pre = jax.nn.sigmoid(mix * params['hc_head_scale']
                             + params['hc_head_base']) + self.hc_eps
        y = jnp.sum(pre[..., None] * x.astype(jnp.float32), axis=2)
        return y.astype(x.dtype)

    # -- compressor ---------------------------------------------------------------------------
    def _compress(self, x, ratio, wkv, wgate, ape, norm_w, ring_kv, ring_sc,
                  positions, valid, cos_c, sin_c, rotate: bool):
        """Pool every ``ratio`` tokens into one compressed row.

        Returns (rows [B,T,D'], emit [B,T], ckv_idx [B,T], ring_kv, ring_sc)
        — ``rows`` is valid where ``emit``; rings hold the last 2*ratio
        projected rows per slot (kernel analog: v4_compressor.py
        _score_kv_kernel; rings indexed relative to the chunk start here
        instead of abs%cap, which is equivalent).
        """
        B, Tn = x.shape[0], x.shape[1]
        coff = ring_kv.shape[-1] // norm_w.shape[0]
        Dc = norm_w.shape[0]
        cap = ring_kv.shape[1]                       # coff * ratio (4) or 128
        kv_c = jnp.dot(x, wkv).astype(jnp.float32)   # [B,T,coff*Dc]
        sc = jnp.dot(x, wgate).astype(jnp.float32) + \
            ape[jnp.remainder(positions, ratio)]
        # padding tokens must not pollute windows: poison their scores
        sc = jnp.where(valid[..., None], sc, NEG)
        full_kv = jnp.concatenate([ring_kv, kv_c], axis=1)   # [B,cap+T,...]
        full_sc = jnp.concatenate([ring_sc, sc], axis=1)

        # emit at abs pos p with (p+1) % ratio == 0; window = [p-cap+1, p]
        # -> full indices [t+1, t+cap]
        win = (jnp.arange(Tn, dtype=jnp.int32)[:, None] + 1
               + jnp.arange(cap, dtype=jnp.int32)[None, :])     # [T, cap]
        wkv_rows = full_kv[:, win]                   # [B,T,cap,coff*Dc]
        wsc_rows = full_sc[:, win]
        # absolute position of window row j for chunk token t
        abs_w = (positions[:, :, None] - cap + 1
                 + jnp.arange(cap, dtype=jnp.int32)[None, None, :])
        if coff == 2:
            r = ratio
            # prev sub-window (rows 0..r-1): LEFT halves; curr: RIGHT halves
            sel_kv = jnp.concatenate(
                [wkv_rows[:, :, :r, :Dc], wkv_rows[:, :, r:, Dc:]], axis=2)
            sel_sc = jnp.concatenate(
                [wsc_rows[:, :, :r, :Dc], wsc_rows[:, :, r:, Dc:]], axis=2)
        else:
            sel_kv, sel_sc = wkv_rows, wsc_rows
        sel_sc = jnp.where((abs_w >= 0)[..., None], sel_sc, NEG)
        p = jax.nn.softmax(sel_sc, axis=2)           # channel-wise over rows
        rows = jnp.sum(p * sel_kv, axis=2)           # [B,T,Dc]
        rows = rms_norm(rows, norm_w, self.config.rms_norm_eps)
        cidx = jnp.maximum(positions + 1 - ratio, 0)
        rows = jnp.concatenate(
            [rows[..., :-self.rd],
             rope_complex(rows[..., -self.rd:], cos_c[cidx], sin_c[cidx])],
            axis=-1)
        if rotate:
            rows = hadamard_transform(rows)
        emit = valid & (jnp.remainder(positions + 1, ratio) == 0)
        ckv_idx = jnp.maximum((positions + 1) // ratio - 1, 0)

        # ring update: last cap projected rows = full[q_len .. q_len+cap-1]
        q_lens = valid.sum(axis=1).astype(jnp.int32)
        idx = q_lens[:, None] + jnp.arange(cap, dtype=jnp.int32)[None, :]
        new_ring_kv = jnp.take_along_axis(full_kv, idx[:, :, None], axis=1)
        new_ring_sc = jnp.take_along_axis(full_sc, idx[:, :, None], axis=1)
        return rows, emit, ckv_idx, new_ring_kv, new_ring_sc

    # -- moe ---------------------------------------------------------------------------------
    def _moe(self, w, x, input_ids, hash_route: bool):
        from ..ops.moe import moe_ffn
        cfg = self.config
        B, Tn, H = x.shape
        xf = x.reshape(B * Tn, H)
        lim = self.swiglu_limit

        def act(gate, up):
            gate = gate.astype(jnp.float32)
            up = up.astype(jnp.float32)
            if lim > 0:
                up = jnp.clip(up, -lim, lim)
                gate = jnp.minimum(gate, lim)
            return jax.nn.silu(gate) * up

        scores = jnp.dot(xf.astype(jnp.float32),
                         w['gate_w'].astype(jnp.float32))
        if self.score_func == 'softmax':
            scores = jax.nn.softmax(scores, axis=-1)
        elif self.score_func == 'sigmoid':
            scores = jax.nn.sigmoid(scores)
        else:
            scores = jnp.sqrt(jax.nn.softplus(scores))
        orig = scores
        if hash_route:
            idx = w['tid2eid'][input_ids.reshape(-1)]           # [N, k]
        else:
            idx = jax.lax.top_k(scores + w['gate_bias'], self.top_k)[1]
        wts = jnp.take_along_axis(orig, idx, axis=-1)
        if self.score_func != 'softmax':
            wts = wts / wts.sum(-1, keepdims=True)
        wts = wts * self.route_scale
        out = moe_ffn(xf, idx.astype(jnp.int32), wts, w['we_gate'],
                      w['we_up'], w['we_down'], x.dtype, act=act,
                      allow_ragged=not getattr(self, 'ep_sharded', False))
        sh = act(jnp.dot(xf, w['ws_gate']), jnp.dot(xf, w['ws_up']))
        out = out + jnp.dot(sh.astype(x.dtype), w['ws_down'],
                            preferred_element_type=jnp.float32)
        return out.reshape(B, Tn, H).astype(x.dtype)

    # -- attention ----------------------------------------------------------------------------
    def _attn(self, l, w, x, kv_cache, meta, positions, valid,
              slot_rows, slot_mapping, cos, sin):
        cfg = self.config
        B, Tn, H = x.shape
        D, rd, nh = self.D, self.rd, self.nh
        ratio = self.ratios[l]

        qr = rms_norm(jnp.dot(x, w['wq_a']), w['q_norm'], cfg.rms_norm_eps)
        q = jnp.dot(qr, w['wq_b']).reshape(B, Tn, nh, D)
        q = rms_scale(q, q, cfg.rms_norm_eps).astype(x.dtype)
        kv = rms_norm(jnp.dot(x, w['wkv']), w['kv_norm'], cfg.rms_norm_eps)
        cos_t, sin_t = cos[positions], sin[positions]   # [B,T,rd/2]
        q = jnp.concatenate(
            [q[..., :-rd],
             rope_complex(q[..., -rd:], cos_t[:, :, None], sin_t[:, :, None])],
            axis=-1)
        kv = jnp.concatenate(
            [kv[..., :-rd], rope_complex(kv[..., -rd:], cos_t, sin_t)],
            axis=-1)

        pages = fill_kv_cache(kv_cache['pages'],
                              kv.reshape(B * Tn, 1, D),
                              kv.reshape(B * Tn, 1, D), slot_mapping,
                              jnp.int32(l))
        kv_cache = dict(kv_cache, pages=pages)

        # ---- compressed stream ------------------------------------------------------------
        comp_rows = None          # [B, C, D] per-slot buffer slice
        comp_sel = None           # [B, T, K, D] indexer-selected rows
        comp_mask = None
        if ratio == 4:
            i4 = self.r4_pos[l]
            rows, emit, cidx, rkv, rsc = self._compress(
                x, 4, w['c_wkv'], w['c_wgate'], w['c_ape'], w['c_norm'],
                kv_cache['c4_kv'][i4][slot_rows],
                kv_cache['c4_sc'][i4][slot_rows],
                positions, valid, *self._compress_rope, rotate=False)
            irows, _, _, irkv, irsc = self._compress(
                x, 4, w['i_wkv'], w['i_wgate'], w['i_ape'], w['i_norm'],
                kv_cache['i4_kv'][i4][slot_rows],
                kv_cache['i4_sc'][i4][slot_rows],
                positions, valid, *self._compress_rope, rotate=True)
            tok_slot = jnp.where(emit, slot_rows[:, None],
                                 kv_cache['ckv4'].shape[1] - 1)
            ckv4 = kv_cache['ckv4'].at[
                i4, tok_slot, jnp.where(emit, cidx, 0)].set(
                rows.astype(kv_cache['ckv4'].dtype))
            ickv4 = kv_cache['ickv4'].at[
                i4, tok_slot, jnp.where(emit, cidx, 0)].set(
                irows.astype(kv_cache['ickv4'].dtype))
            kv_cache = dict(
                kv_cache, ckv4=ckv4, ickv4=ickv4,
                c4_kv=kv_cache['c4_kv'].at[i4, slot_rows].set(rkv),
                c4_sc=kv_cache['c4_sc'].at[i4, slot_rows].set(rsc),
                i4_kv=kv_cache['i4_kv'].at[i4, slot_rows].set(irkv),
                i4_sc=kv_cache['i4_sc'].at[i4, slot_rows].set(irsc))

            # indexer scoring over the rotated compressed stream
            C = ckv4.shape[2]
            ick = ickv4[i4][slot_rows]                       # [B, C, Di]
            iq = jnp.dot(qr, w['i_wq_b']).reshape(
                B, Tn, self.idx_heads, self.idx_dim)
            iq = jnp.concatenate(
                [iq[..., :-rd],
                 rope_complex(iq[..., -rd:], cos_t[:, :, None],
                              sin_t[:, :, None])], axis=-1)
            iq = hadamard_transform(iq)
            iw = (jnp.dot(x, w['i_weights'])
                  * (self.idx_dim ** -0.5 * self.idx_heads ** -0.5)
                  ).astype(jnp.float32)
            logit = jnp.einsum('bthd,bcd->bhtc', iq.astype(jnp.float32),
                               ick.astype(jnp.float32))
            score = jnp.einsum('bhtc,bth->btc', jnp.maximum(logit, 0.0), iw)
            count = (positions + 1) // 4                     # visible rows
            causal = (jnp.arange(C, dtype=jnp.int32)[None, None, :]
                      < count[:, :, None])
            score = jnp.where(causal, score, -jnp.inf)
            K = min(self.idx_topk, C)
            top_s, top_i = jax.lax.top_k(score, K)
            comp_sel = jnp.take_along_axis(
                ckv4[i4][slot_rows][:, None], top_i[..., None], axis=2)
            comp_mask = jnp.isfinite(top_s)                  # [B,T,K]
        elif ratio:
            i128 = self.rn_pos[l]
            rows, emit, cidx, rkv, rsc = self._compress(
                x, ratio, w['c_wkv'], w['c_wgate'], w['c_ape'], w['c_norm'],
                kv_cache['c128_kv'][i128][slot_rows],
                kv_cache['c128_sc'][i128][slot_rows],
                positions, valid, *self._compress_rope, rotate=False)
            tok_slot = jnp.where(emit, slot_rows[:, None],
                                 kv_cache['ckv128'].shape[1] - 1)
            ckv128 = kv_cache['ckv128'].at[
                i128, tok_slot, jnp.where(emit, cidx, 0)].set(
                rows.astype(kv_cache['ckv128'].dtype))
            kv_cache = dict(
                kv_cache, ckv128=ckv128,
                c128_kv=kv_cache['c128_kv'].at[i128, slot_rows].set(rkv),
                c128_sc=kv_cache['c128_sc'].at[i128, slot_rows].set(rsc))
            comp_rows = ckv128[i128][slot_rows]              # [B, C, D]
            C = comp_rows.shape[1]
            count = (positions + 1) // ratio
            comp_mask = (jnp.arange(C, dtype=jnp.int32)[None, None, :]
                         < count[:, :, None])                # [B,T,C]

        # ---- window raw attention + combined softmax --------------------------------------
        k_raw, _ = gather_layer_kv(pages, jnp.int32(l), meta.block_tables,
                                   1, D)
        k_raw = k_raw[0]                                     # [B, S, D]
        S = k_raw.shape[1]
        pos_k = jnp.arange(S, dtype=jnp.int32)[None, None, :]
        win_ok = ((pos_k <= positions[:, :, None])
                  & (pos_k > positions[:, :, None] - self.window))
        qf = q.astype(jnp.float32)
        log_raw = jnp.einsum('btnd,bsd->bnts', qf,
                             k_raw.astype(jnp.float32)) * self.scale
        log_raw = jnp.where(win_ok[:, None], log_raw, NEG)
        sink = w['sink'].astype(jnp.float32)[None, :, None]   # [1,nh,1]

        if ratio == 4:
            log_c = jnp.einsum('btnd,btkd->bntk', qf,
                               comp_sel.astype(jnp.float32)) * self.scale
            log_c = jnp.where(comp_mask[:, None], log_c, NEG)
        elif ratio:
            log_c = jnp.einsum('btnd,bcd->bntc', qf,
                               comp_rows.astype(jnp.float32)) * self.scale
            log_c = jnp.where(comp_mask[:, None], log_c, NEG)
        else:
            log_c = None

        m = jnp.max(log_raw, axis=-1)
        if log_c is not None:
            m = jnp.maximum(m, jnp.max(log_c, axis=-1))
        m = jnp.maximum(m, sink)
        e_raw = jnp.exp(log_raw - m[..., None])
        denom = e_raw.sum(-1) + jnp.exp(sink - m)
        acc = jnp.einsum('bnts,bsd->bntd', e_raw, k_raw.astype(jnp.float32))
        if ratio == 4:
            e_c = jnp.exp(log_c - m[..., None])
            denom = denom + e_c.sum(-1)
            acc = acc + jnp.einsum('bntk,btkd->bntd', e_c,
                                   comp_sel.astype(jnp.float32))
        elif ratio:
            e_c = jnp.exp(log_c - m[..., None])
            denom = denom + e_c.sum(-1)
            acc = acc + jnp.einsum('bntc,bcd->bntd', e_c,
                                   comp_rows.astype(jnp.float32))
        out = (acc / denom[..., None]).astype(x.dtype)       # [B,nh,T,D]
        out = jnp.moveaxis(out, 1, 2)                        # [B,T,nh,D]

        # inverse rope on the output's rope dims (reference Attention.forward
        # applies (cos, -sin) before wo)
        out = jnp.concatenate(
            [out[..., :-rd],
             rope_complex(out[..., -rd:], cos_t[:, :, None],
                          -sin_t[:, :, None])], axis=-1)
        g = self.o_groups
        og = out.reshape(B, Tn, g, (nh // g) * D)
        o = jnp.einsum('btgi,gio->btgo', og.astype(jnp.float32),
                       w['wo_a'].astype(jnp.float32))
        o = o.reshape(B, Tn, g * self.o_rank).astype(x.dtype)
        return jnp.dot(o, w['wo_b']), kv_cache

    # -- forward --------------------------------------------------------------------------
    def forward(self, params, input_ids, positions, kv_cache, meta: AttnMeta,
                rope_cos, rope_sin, return_all_logits=False,
                fresh_prefill=False, input_embeds=None, embeds_mask=None,
                adapter_ids=None, return_hidden=False):
        cfg = self.config
        B, Tn = input_ids.shape
        block_size = kv_cache['pages'].shape[3] \
            if not hasattr(kv_cache['pages'], 'data') \
            else kv_cache['pages'].data.shape[3]

        hidden = params['embed'][input_ids].astype(cfg.jnp_dtype())
        if input_embeds is not None:
            hidden = jnp.where(embeds_mask[..., None],
                               input_embeds.astype(hidden.dtype), hidden)
        x = jnp.broadcast_to(hidden[:, :, None, :],
                             (B, Tn, self.hc, cfg.hidden_size))
        slot_mapping = compute_slot_mapping(meta.block_tables,
                                            meta.history_lens, meta.q_lens,
                                            Tn, block_size)
        slot_rows = meta.slot_rows if meta.slot_rows is not None \
            else jnp.arange(B, dtype=jnp.int32)
        valid = (jnp.arange(Tn, dtype=jnp.int32)[None, :]
                 < meta.q_lens[:, None])
        plain_cos, plain_sin = self._plain
        comp_cos, comp_sin = self._compress_rope

        for l in range(cfg.num_layers):
            w = params['layers'][str(l)]
            cos, sin = ((comp_cos, comp_sin) if self.ratios[l]
                        else (plain_cos, plain_sin))
            y, post, comb = self._hc_pre(x, w['hc_attn_fn'],
                                         w['hc_attn_scale'],
                                         w['hc_attn_base'])
            h = rms_norm(y, w['attn_norm'], cfg.rms_norm_eps)
            attn, kv_cache = self._attn(l, w, h, kv_cache, meta,
                                        positions, valid, slot_rows,
                                        slot_mapping, cos, sin)
            x = self._hc_post(attn, x, post, comb)

            y, post, comb = self._hc_pre(x, w['hc_ffn_fn'],
                                         w['hc_ffn_scale'], w['hc_ffn_base'])
            h = rms_norm(y, w['ffn_norm'], cfg.rms_norm_eps)
            f = self._moe(w, h, input_ids, hash_route=l < self.n_hash)
            x = self._hc_post(f, x, post, comb)

        hidden = self._hc_head(x, params)
        hidden_prenorm = hidden
        hidden = rms_norm(hidden, params['final_norm'], cfg.rms_norm_eps)

        def head(z):
            return jnp.dot(z, params['lm_head'],
                           preferred_element_type=jnp.float32)

        if return_all_logits:
            if return_hidden:
                return head(hidden), kv_cache, hidden_prenorm
            return head(hidden), kv_cache
        last_idx = jnp.maximum(meta.q_lens - 1, 0)
        last_hidden = jnp.take_along_axis(
            hidden, last_idx[:, None, None], axis=1)[:, 0]
        return head(last_hidden), kv_cache
