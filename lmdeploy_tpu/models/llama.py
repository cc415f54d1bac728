"""Llama-family causal LM in functional JAX, layer-stacked for ``lax.scan``.

Reference analog: ``lmdeploy/pytorch/models/llama.py`` (LlamaForCausalLM ``:289``) — but
the architecture here is TPU-first, not a translation:

  * All per-layer weights are stacked along a leading L axis and the decoder runs as one
    ``lax.scan`` over layers, so compile time is O(1) in depth and XLA pipelines the
    per-layer HBM traffic.
  * The paged KV cache is scanned alongside the weights: each layer consumes and emits
    its cache slice functionally; with buffer donation the update is in-place in HBM.
  * Prefill, chunked prefill and decode share this single forward — decode is a T=1
    chunk — mirroring TurboMind's UnifiedDecoder contract
    (src/turbomind/models/llama/unified_decoder.h:17) without separate code paths.
  * Projections are kept un-fused (wq/wk/wv, w_gate/w_up) so tensor-parallel
    PartitionSpecs shard each output axis cleanly (megatron-style column/row split);
    the decode path is weight-streaming-bound so fusing buys nothing on TPU.

Covers LlamaForCausalLM, MistralForCausalLM, Qwen2ForCausalLM (attention bias),
Qwen3ForCausalLM (qk-norm, explicit head_dim), InternLM2ForCausalLM (fused wqkv naming),
TinyLlama, etc. via weight-name mapping tables.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..nn.layers import apply_rope, make_rope_table, rms_norm
from ..ops.attention import compute_slot_mapping, fill_kv_cache, paged_attention


@dataclass
class AttnMeta:
    """Per-step attention metadata (reference analog: model_inputs.py StepContext)."""

    block_tables: jax.Array    # [B, W] int32
    history_lens: jax.Array    # [B] int32 — cached tokens before this chunk
    q_lens: jax.Array          # [B] int32 — valid tokens in this chunk


jax.tree_util.register_dataclass(
    AttnMeta, data_fields=['block_tables', 'history_lens', 'q_lens'], meta_fields=[])


class LlamaModel:
    """Weights container + forward for the dense llama family."""

    def __init__(self, config: ModelConfig):
        self.config = config
        cfg = config
        self.q_out = cfg.num_attention_heads * cfg.head_dim
        self.kv_out = cfg.num_key_value_heads * cfg.head_dim

    # -- parameter allocation ----------------------------------------------------------
    def param_shapes(self) -> Dict[str, Any]:
        cfg = self.config
        L, H, I, V = (cfg.num_layers, cfg.hidden_size, cfg.intermediate_size,
                      cfg.vocab_size)
        D = cfg.head_dim
        layers = {
            'attn_norm': (L, H),
            'wq': (L, H, self.q_out),
            'wk': (L, H, self.kv_out),
            'wv': (L, H, self.kv_out),
            'wo': (L, self.q_out, H),
            'mlp_norm': (L, H),
            'w_gate': (L, H, I),
            'w_up': (L, H, I),
            'w_down': (L, I, H),
        }
        if cfg.attention_bias:
            layers['bq'] = (L, self.q_out)
            layers['bk'] = (L, self.kv_out)
            layers['bv'] = (L, self.kv_out)
        if cfg.qk_norm:
            layers['q_norm'] = (L, D)
            layers['k_norm'] = (L, D)
        shapes = {
            'embed': (V, H),
            'layers': layers,
            'final_norm': (H,),
        }
        if not cfg.tie_word_embeddings:
            shapes['lm_head'] = (H, V)
        return shapes

    def init_params(self, rng: Optional[jax.Array] = None, scale: float = 0.02):
        """Random/zero init (benchmarks, tests; real weights come from the loader)."""
        dtype = self.config.jnp_dtype()

        def make(path, shape):
            name = path[-1]
            if rng is None:
                return jnp.zeros(shape, dtype)
            if 'norm' in name:
                return jnp.ones(shape, dtype)
            import zlib
            key = jax.random.fold_in(rng, zlib.crc32('/'.join(path).encode()))
            return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)

        shapes = self.param_shapes()
        out: Dict[str, Any] = {}
        for k, v in shapes.items():
            if isinstance(v, dict):
                out[k] = {k2: make((k, k2), s) for k2, s in v.items()}
            else:
                out[k] = make((k,), v)
        return out

    # -- HF weight mapping -------------------------------------------------------------
    def make_assign_plan(self):
        """Return {hf_name: (path, transform, col_slice)} resolver for the loader.

        The loader writes ``params[path][..., col_slice] = transform(tensor)`` where a
        layer index inside ``path`` selects the stacked row.
        """
        cfg = self.config
        I = cfg.intermediate_size
        q_out, kv_out = self.q_out, self.kv_out

        def T(x):
            return np.ascontiguousarray(np.swapaxes(x, -1, -2))

        ident = lambda x: x  # noqa: E731
        plan: Dict[str, Tuple] = {
            'model.embed_tokens.weight': (('embed',), ident, None),
            'model.norm.weight': (('final_norm',), ident, None),
        }
        if not cfg.tie_word_embeddings:
            plan['lm_head.weight'] = (('lm_head',), T, None)
        per_layer = [
            ('model.layers.{}.input_layernorm.weight', ('layers', 'attn_norm'), ident, None),
            ('model.layers.{}.post_attention_layernorm.weight', ('layers', 'mlp_norm'),
             ident, None),
            ('model.layers.{}.self_attn.q_proj.weight', ('layers', 'wq'), T, None),
            ('model.layers.{}.self_attn.k_proj.weight', ('layers', 'wk'), T, None),
            ('model.layers.{}.self_attn.v_proj.weight', ('layers', 'wv'), T, None),
            ('model.layers.{}.self_attn.o_proj.weight', ('layers', 'wo'), T, None),
            ('model.layers.{}.mlp.gate_proj.weight', ('layers', 'w_gate'), T, None),
            ('model.layers.{}.mlp.up_proj.weight', ('layers', 'w_up'), T, None),
            ('model.layers.{}.mlp.down_proj.weight', ('layers', 'w_down'), T, None),
            ('model.layers.{}.self_attn.q_proj.bias', ('layers', 'bq'), ident, None),
            ('model.layers.{}.self_attn.k_proj.bias', ('layers', 'bk'), ident, None),
            ('model.layers.{}.self_attn.v_proj.bias', ('layers', 'bv'), ident, None),
            ('model.layers.{}.self_attn.q_norm.weight', ('layers', 'q_norm'), ident, None),
            ('model.layers.{}.self_attn.k_norm.weight', ('layers', 'k_norm'), ident, None),
        ]
        for key_fmt, path, transform, col in per_layer:
            for layer in range(cfg.num_layers):
                plan[key_fmt.format(layer)] = (path + (layer,), transform, col)
        return plan

    # -- forward -----------------------------------------------------------------------
    def forward(self, params, input_ids: jax.Array, positions: jax.Array,
                k_cache: jax.Array, v_cache: jax.Array, meta: AttnMeta,
                rope_cos: jax.Array, rope_sin: jax.Array,
                return_all_logits: bool = False,
                ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """One forward step.

        Args:
          input_ids: [B, T] (T==1 for decode)
          positions: [B, T] absolute positions (padding rows clamped in-range)
          k_cache/v_cache: [L, NB, BS, Hkv, D]
          rope_cos/rope_sin: full tables [max_len, D/2]
        Returns (logits, k_cache, v_cache); logits is [B, V] at each row's last valid
        token, or [B, T, V] when return_all_logits.
        """
        cfg = self.config
        B, T = input_ids.shape
        D = cfg.head_dim
        scale = 1.0 / math.sqrt(D)
        block_size = k_cache.shape[2]

        hidden = params['embed'][input_ids].astype(cfg.jnp_dtype())   # [B,T,H]
        cos = rope_cos[positions]     # [B,T,D/2] f32
        sin = rope_sin[positions]
        slot_mapping = compute_slot_mapping(meta.block_tables, meta.history_lens,
                                            meta.q_lens, T, block_size)

        lp = params['layers']
        has_bias = 'bq' in lp
        has_qknorm = 'q_norm' in lp

        def proj(x, w, b=None):
            y = jnp.dot(x, w, preferred_element_type=jnp.float32)
            if b is not None:
                y = y + b.astype(jnp.float32)
            return y.astype(x.dtype)

        def layer_fn(h, xs):
            w, k_c, v_c = xs
            x = rms_norm(h, w['attn_norm'], cfg.rms_norm_eps)
            q = proj(x, w['wq'], w.get('bq') if has_bias else None)
            k = proj(x, w['wk'], w.get('bk') if has_bias else None)
            v = proj(x, w['wv'], w.get('bv') if has_bias else None)
            q = q.reshape(B, T, cfg.num_attention_heads, D)
            k = k.reshape(B, T, cfg.num_key_value_heads, D)
            v = v.reshape(B, T, cfg.num_key_value_heads, D)
            if has_qknorm:
                q = rms_norm(q, w['q_norm'], cfg.rms_norm_eps)
                k = rms_norm(k, w['k_norm'], cfg.rms_norm_eps)
            q, k = apply_rope(q, k, cos, sin)
            k_c, v_c = fill_kv_cache(k_c, v_c, k.reshape(B * T, -1, D),
                                     v.reshape(B * T, -1, D), slot_mapping)
            attn = paged_attention(q, k_c, v_c, meta.block_tables, meta.history_lens,
                                   meta.q_lens, scale,
                                   window_size=cfg.sliding_window)
            attn = attn.reshape(B, T, self.q_out)
            h = h + proj(attn, w['wo'])
            x = rms_norm(h, w['mlp_norm'], cfg.rms_norm_eps)
            act = jax.nn.silu(jnp.dot(x, w['w_gate'], preferred_element_type=jnp.float32))
            act = act * jnp.dot(x, w['w_up'], preferred_element_type=jnp.float32)
            h = h + proj(act.astype(h.dtype), w['w_down'])
            return h, (k_c, v_c)

        hidden, (k_cache, v_cache) = jax.lax.scan(layer_fn, hidden,
                                                  (lp, k_cache, v_cache))
        hidden = rms_norm(hidden, params['final_norm'], cfg.rms_norm_eps)

        lm_head = params.get('lm_head')
        if lm_head is None:
            lm_head = params['embed'].T
        if return_all_logits:
            logits = jnp.dot(hidden, lm_head, preferred_element_type=jnp.float32)
            return logits, k_cache, v_cache
        last_idx = jnp.maximum(meta.q_lens - 1, 0)
        last_hidden = jnp.take_along_axis(
            hidden, last_idx[:, None, None], axis=1)[:, 0]            # [B,H]
        logits = jnp.dot(last_hidden, lm_head, preferred_element_type=jnp.float32)
        return logits, k_cache, v_cache
