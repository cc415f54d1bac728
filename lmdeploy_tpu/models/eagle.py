"""EAGLE speculative-decoding head (feature-level autoregression).

Reference analog: ``lmdeploy/pytorch/spec_decode/eagle*`` and the public EAGLE
checkpoints (yuhuili/EAGLE-*): one llama decoder layer whose input is
``fc([embed(token) ; hidden])`` — the concatenation of the next token's
embedding and the target model's pre-final-norm feature — with the target's
final norm + lm_head producing the draft logits.  The head keeps its own
1-layer paged KV cache and proposes autoregressively, conditioning later
proposals on its OWN output features (standard EAGLE chain).

Checkpoint layout handled (EAGLE-1 llama heads):
  fc.weight [H, 2H]; layers.0.self_attn.{q,k,v,o}_proj, layers.0.mlp.*,
  layers.0.post_attention_layernorm (the input_layernorm is Identity in
  EAGLE heads — no pre-attention norm here either).
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


class EagleHead:
    """Single-layer draft head over the target's feature space."""

    def __init__(self, config: ModelConfig):
        self.config = config
        cfg = config
        self.nh = cfg.num_attention_heads
        self.nkv = cfg.num_key_value_heads
        self.D = cfg.head_dim
        self.scale = 1.0 / math.sqrt(self.D)

    def param_shapes(self) -> Dict[str, Any]:
        cfg = self.config
        H, I = cfg.hidden_size, cfg.intermediate_size
        return {
            'fc': (2 * H, H),
            'wq': (H, self.nh * self.D),
            'wk': (H, self.nkv * self.D),
            'wv': (H, self.nkv * self.D),
            'wo': (self.nh * self.D, H),
            'mlp_norm': (H,),
            'w_gate': (H, I), 'w_up': (H, I), 'w_down': (I, H),
        }

    def init_params(self, rng=None, scale: float = 0.02):
        rng = np.random.default_rng(3)
        dtype = self.config.jnp_dtype()

        def mk(name, shape):
            if 'norm' in name:
                return jnp.ones(shape, dtype)
            return jnp.asarray(rng.normal(0, scale, shape), dtype)

        return {k: mk(k, v) for k, v in self.param_shapes().items()}

    def make_assign_plan(self):
        def T(x):
            return np.ascontiguousarray(np.swapaxes(x, -1, -2))

        ident = lambda x: x  # noqa: E731
        return {
            'fc.weight': (('fc',), T, None),
            'layers.0.self_attn.q_proj.weight': (('wq',), T, None),
            'layers.0.self_attn.k_proj.weight': (('wk',), T, None),
            'layers.0.self_attn.v_proj.weight': (('wv',), T, None),
            'layers.0.self_attn.o_proj.weight': (('wo',), T, None),
            'layers.0.post_attention_layernorm.weight': (('mlp_norm',), ident, None),
            'layers.0.mlp.gate_proj.weight': (('w_gate',), T, None),
            'layers.0.mlp.up_proj.weight': (('w_up',), T, None),
            'layers.0.mlp.down_proj.weight': (('w_down',), T, None),
        }

    def step(self, params, tparams, h_cond, token, position, kv_cache,
             block_tables, q_lens, cos_tab, sin_tab, max_len):
        """One draft step.

        Args: h_cond [B, H] conditioning features; token [B]; position [B]
        (where this token lands in the cache).  Returns (logits [B, V],
        h_new [B, H], kv_cache).
        """
        cfg = self.config
        B = token.shape[0]
        D, nh, nkv = self.D, self.nh, self.nkv

        emb = tparams['embed'][token].astype(h_cond.dtype)         # [B, H]
        x = jnp.concatenate([emb, h_cond], axis=-1) @ params['fc']  # [B, H]
        xt = x[:, None, :]                                          # [B, 1, H]
        pos = jnp.clip(position, 0, max_len - 1)[:, None]
        cos, sin = cos_tab[pos], sin_tab[pos]
        q = (xt @ params['wq']).reshape(B, 1, nh, D)
        k = (xt @ params['wk']).reshape(B, 1, nkv, D)
        v = (xt @ params['wv']).reshape(B, 1, nkv, D)
        q, k = apply_rope(q, k, cos, sin)
        from ..ops.attention import compute_slot_mapping
        slots = compute_slot_mapping(block_tables, position, q_lens, 1,
                                     kv_cache.shape[3])
        kv_cache = fill_kv_cache(kv_cache, k.reshape(B, nkv, D),
                                 v.reshape(B, nkv, D), slots, jnp.int32(0))
        attn = paged_attention(q, kv_cache, block_tables, position,
                               q_lens, self.scale, jnp.int32(0), nkv,
                               chunk_kv=(k, v))
        h = x + attn.reshape(B, nh * D) @ params['wo']
        y = rms_norm(h, params['mlp_norm'], cfg.rms_norm_eps)
        act = jax.nn.silu((y @ params['w_gate']).astype(jnp.float32))
        act = act * (y @ params['w_up']).astype(jnp.float32)
        h_new = h + act.astype(h.dtype) @ params['w_down']

        lm_head = tparams.get('lm_head')
        if lm_head is None:
            lm_head = tparams['embed'].T
        hn = rms_norm(h_new, tparams['final_norm'], cfg.rms_norm_eps)
        logits = jnp.dot(hn, lm_head, preferred_element_type=jnp.float32)
        return logits, h_new, kv_cache


class Eagle3Head:
    """EAGLE-3 draft head (reference: ``models/llama_eagle3.py`` +
    ``spec_decode/proposers/eagle3.py``).

    Differences from EAGLE-1: the single decoder layer attends over
    ``[rmsnorm(embed) ; rmsnorm(hidden)]`` (2H-wide qkv input, separate
    input/hidden norms) instead of ``fc([embed ; hidden])``; the ``fc``
    maps the TARGET's concatenated aux hidden states (3 intermediate
    layers, 3*target_H) into the draft width and is applied only to the
    round's first conditioning; the head owns its final norm + lm_head
    over a REDUCED draft vocab, with ``d2t`` (stored as offsets in the
    checkpoint) translating sampled draft ids to target ids.
    """

    def __init__(self, config: ModelConfig):
        self.config = config
        cfg = config
        hf = cfg.hf_config or {}
        self.nh = cfg.num_attention_heads
        self.nkv = cfg.num_key_value_heads
        self.D = cfg.head_dim
        self.scale = 1.0 / math.sqrt(self.D)
        self.target_hidden = int(hf.get('target_hidden_size')
                                 or cfg.hidden_size)
        self.draft_vocab = int(hf.get('draft_vocab_size') or cfg.vocab_size)
        self.saw_embed = False      # set by the assign plan when the ckpt
        #                             ships its own embed_tokens

    def param_shapes(self) -> Dict[str, Any]:
        cfg = self.config
        H, I = cfg.hidden_size, cfg.intermediate_size
        return {
            'embed': (cfg.vocab_size, H),
            'fc': (3 * self.target_hidden, H),
            'input_norm': (H,),
            'hidden_norm': (H,),
            'wq': (2 * H, self.nh * self.D),
            'wk': (2 * H, self.nkv * self.D),
            'wv': (2 * H, self.nkv * self.D),
            'wo': (self.nh * self.D, H),
            'mlp_norm': (H,),
            'w_gate': (H, I), 'w_up': (H, I), 'w_down': (I, H),
            'final_norm': (H,),
            'lm_head': (H, self.draft_vocab),
            'd2t': jax.ShapeDtypeStruct((self.draft_vocab,), jnp.int32),
        }

    def init_params(self, rng=None, scale: float = 0.02):
        rng = np.random.default_rng(7)
        dtype = self.config.jnp_dtype()

        def mk(name, spec):
            if name == 'd2t':
                return jnp.arange(self.draft_vocab, dtype=jnp.int32)
            shape = spec.shape if hasattr(spec, 'shape') else spec
            if 'norm' in name:
                return jnp.ones(shape, dtype)
            return jnp.asarray(rng.normal(0, scale, shape), dtype)

        self.saw_embed = True
        return {k: mk(k, v) for k, v in self.param_shapes().items()}

    def make_assign_plan(self):
        def T(x):
            return np.ascontiguousarray(np.swapaxes(x, -1, -2))

        def embed(x):
            self.saw_embed = True
            return x

        def d2t(x):
            # checkpoint stores offsets; absolute id = offset + draft id
            return (np.asarray(x, np.int64)
                    + np.arange(self.draft_vocab)).astype(np.int32)

        ident = lambda x: x  # noqa: E731
        return {
            'embed_tokens.weight': (('embed',), embed, None),
            'fc.weight': (('fc',), T, None),
            'midlayer.input_layernorm.weight': (('input_norm',), ident, None),
            'midlayer.hidden_norm.weight': (('hidden_norm',), ident, None),
            'midlayer.self_attn.q_proj.weight': (('wq',), T, None),
            'midlayer.self_attn.k_proj.weight': (('wk',), T, None),
            'midlayer.self_attn.v_proj.weight': (('wv',), T, None),
            'midlayer.self_attn.o_proj.weight': (('wo',), T, None),
            'midlayer.post_attention_layernorm.weight':
                (('mlp_norm',), ident, None),
            'midlayer.mlp.gate_proj.weight': (('w_gate',), T, None),
            'midlayer.mlp.up_proj.weight': (('w_up',), T, None),
            'midlayer.mlp.down_proj.weight': (('w_down',), T, None),
            'norm.weight': (('final_norm',), ident, None),
            'lm_head.weight': (('lm_head',), T, None),
            'd2t': (('d2t',), d2t, None),
        }

    def step(self, params, emb_table, h_cond, token, position, kv_cache,
             block_tables, q_lens, cos_tab, sin_tab, max_len):
        """One draft step.  h_cond [B, H] is ALREADY in draft width (the
        caller applies ``fc`` once to the target's aux features); returns
        (draft logits [B, draft_V], prenorm hidden [B, H], kv_cache)."""
        cfg = self.config
        B = token.shape[0]
        D, nh, nkv = self.D, self.nh, self.nkv

        emb = emb_table[token].astype(h_cond.dtype)                 # [B, H]
        x = jnp.concatenate(
            [rms_norm(emb, params['input_norm'], cfg.rms_norm_eps),
             rms_norm(h_cond, params['hidden_norm'], cfg.rms_norm_eps)],
            axis=-1)                                                # [B, 2H]
        xt = x[:, None, :]
        pos = jnp.clip(position, 0, max_len - 1)[:, None]
        cos, sin = cos_tab[pos], sin_tab[pos]
        q = (xt @ params['wq']).reshape(B, 1, nh, D)
        k = (xt @ params['wk']).reshape(B, 1, nkv, D)
        v = (xt @ params['wv']).reshape(B, 1, nkv, D)
        q, k = apply_rope(q, k, cos, sin)
        from ..ops.attention import compute_slot_mapping
        slots = compute_slot_mapping(block_tables, position, q_lens, 1,
                                     kv_cache.shape[3])
        kv_cache = fill_kv_cache(kv_cache, k.reshape(B, nkv, D),
                                 v.reshape(B, nkv, D), slots, jnp.int32(0))
        attn = paged_attention(q, kv_cache, block_tables, position,
                               q_lens, self.scale, jnp.int32(0), nkv,
                               chunk_kv=(k, v))
        h = h_cond + attn.reshape(B, nh * D) @ params['wo']
        y = rms_norm(h, params['mlp_norm'], cfg.rms_norm_eps)
        act = jax.nn.silu((y @ params['w_gate']).astype(jnp.float32))
        act = act * (y @ params['w_up']).astype(jnp.float32)
        prenorm = h + act.astype(h.dtype) @ params['w_down']

        hn = rms_norm(prenorm, params['final_norm'], cfg.rms_norm_eps)
        logits = jnp.dot(hn, params['lm_head'],
                         preferred_element_type=jnp.float32)
        return logits, prenorm, kv_cache
