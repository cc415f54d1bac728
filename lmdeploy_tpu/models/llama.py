"""Llama-family causal LM in functional JAX, layer-stacked for ``lax.scan``.

Reference analog: ``lmdeploy/pytorch/models/llama.py`` (LlamaForCausalLM ``:289``) — but
the architecture here is TPU-first, not a translation:

  * All per-layer weights are stacked along a leading L axis and the decoder runs as one
    ``lax.scan`` over layers, so compile time is O(1) in depth and XLA pipelines the
    per-layer HBM traffic.
  * The paged KV cache (one unified array, see ops/attention.py) is scanned alongside
    the weights: each layer consumes and emits the cache functionally; with buffer
    donation the update is in-place in HBM.
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
from ..nn.layers import apply_rope, rms_norm
from ..ops.attention import compute_slot_mapping, fill_kv_cache, paged_attention


@dataclass
class AttnMeta:
    """Per-step attention metadata (reference analog: model_inputs.py StepContext)."""

    block_tables: jax.Array    # [B, W] int32
    history_lens: jax.Array    # [B] int32 — cached tokens before this chunk
    q_lens: jax.Array          # [B] int32 — valid tokens in this chunk
    slot_rows: Optional[jax.Array] = None    # [B] i32 — batch slot per row
    reset_rows: Optional[jax.Array] = None   # [B] bool — fresh sequences
    # (slot/reset feed per-sequence recurrent state in hybrid linear-attention
    #  models; attention-only models ignore them)


jax.tree_util.register_dataclass(
    AttnMeta,
    data_fields=['block_tables', 'history_lens', 'q_lens', 'slot_rows',
                 'reset_rows'],
    meta_fields=[])


class LlamaModel:
    """Weights container + forward for the dense llama family.

    When the checkpoint carries a quantization_config (awq/gptq -> w4a16,
    smooth_quant -> w8a8), the seven decoder linears become quantized weight
    leaves dispatched by nn/linear.py; embed/lm_head stay dense (matching the
    reference's quantized-model layout).
    """

    QUANT_LINEARS = ('wq', 'wk', 'wv', 'wo', 'w_gate', 'w_up', 'w_down')
    # subclasses whose param layouts diverge from the seven dense linears
    # (MLA projections, expert stacks) dequantize blocked fp8 at load instead
    RUNTIME_BLOCKED_FP8 = True
    dequant_on_load = False

    def __init__(self, config: ModelConfig):
        self.config = config
        cfg = config
        self.q_out = cfg.num_attention_heads * cfg.head_dim
        self.kv_out = cfg.num_key_value_heads * cfg.head_dim
        self.embed_scale = 1.0            # gemma: sqrt(hidden_size)
        self.residual_scale = None        # minicpm: scale_depth/sqrt(L)
        self.final_logit_softcap = None   # gemma-2
        self.attn_logit_softcap = None    # gemma-2 attention softcapping
        self.attn_scale = None            # gemma: query_pre_attn_scalar**-0.5
        self.block_causal_size = None     # diffusion-LM (SDAR) block pattern
        # EAGLE-3 aux feature taps: per-layer-OUTPUT indices whose hidden
        # states concat into the draft conditioning (reference llama.py
        # aux_hidden_state_layers, which taps layer INPUTS (2, L/2, L-3) ==
        # outputs (1, L/2-1, L-4))
        self.aux_hidden_layers = None
        # gemma3-VL: image tokens attend bidirectionally among themselves
        self.bidir_image_token = None
        self.quant_method = None
        self.group_size = 128
        qcfg = cfg.quantization_config or {}
        method = qcfg.get('quant_method')
        if method in ('awq', 'gptq'):
            self.quant_method = 'w4a16'
            self.group_size = qcfg.get('group_size') or qcfg.get('q_group_size', 128)
        elif method in ('smooth_quant', 'w8a8'):
            self.quant_method = 'w8a8'
        elif method in ('fp8', 'fbgemm_fp8'):
            # weight-only fp8-e4m3: per-output-channel / per-tensor scales, or
            # block-wise scale grids (DeepSeek-V3 native 128x128)
            if qcfg.get('weight_block_size'):
                if self.RUNTIME_BLOCKED_FP8:
                    self.quant_method = 'fp8_blocked'
                    self.fp8_block = tuple(qcfg['weight_block_size'])
                else:
                    # stacked layouts (MLA / expert stacks) have no blocked
                    # leaves yet: dequantize while streaming the checkpoint
                    self.dequant_on_load = True
            else:
                self.quant_method = 'fp8'

    # -- parameter allocation ----------------------------------------------------------
    def _linear_shape(self, L: int, K: int, N: int):
        import jax
        if self.quant_method == 'w4a16':
            from ..lite.formats import pad_k4
            gs = self.group_size
            Kp = pad_k4(K, gs)       # plane-packed layout: K in whole groups x4
            return {'packed': jax.ShapeDtypeStruct((L, Kp // 8, N), jnp.int32),
                    'scales': jax.ShapeDtypeStruct((L, Kp // gs, N), jnp.float32),
                    'zeros': jax.ShapeDtypeStruct((L, Kp // gs, N), jnp.float32)}
        if self.quant_method == 'w8a8':
            return {'w8': jax.ShapeDtypeStruct((L, K, N), jnp.int8),
                    'scale': jax.ShapeDtypeStruct((L, N), jnp.float32)}
        if self.quant_method == 'fp8':
            return {'w8': jax.ShapeDtypeStruct((L, K, N), jnp.float8_e4m3fn),
                    'scale': jax.ShapeDtypeStruct((L, N), jnp.float32)}
        if self.quant_method == 'fp8_blocked':
            b0, b1 = self.fp8_block
            return {'w8': jax.ShapeDtypeStruct((L, K, N), jnp.float8_e4m3fn),
                    'bscale': jax.ShapeDtypeStruct(
                        (L, -(-K // b1), -(-N // b0)), jnp.float32)}
        return (L, K, N)

    def _mlp_shapes(self, L: int, H: int, I: int) -> Dict[str, Any]:
        return {
            'w_gate': self._linear_shape(L, H, I),
            'w_up': self._linear_shape(L, H, I),
            'w_down': self._linear_shape(L, I, H),
        }

    def param_shapes(self) -> Dict[str, Any]:
        cfg = self.config
        L, H, I, V = (cfg.num_layers, cfg.hidden_size, cfg.intermediate_size,
                      cfg.vocab_size)
        D = cfg.head_dim
        layers = {
            'attn_norm': (L, H),
            'wq': self._linear_shape(L, H, self.q_out),
            'wk': self._linear_shape(L, H, self.kv_out),
            'wv': self._linear_shape(L, H, self.kv_out),
            'wo': self._linear_shape(L, self.q_out, H),
            'mlp_norm': (L, H),
        }
        layers.update(self._mlp_shapes(L, H, I))
        if cfg.attention_bias:
            layers['bq'] = (L, self.q_out)
            layers['bk'] = (L, self.kv_out)
            layers['bv'] = (L, self.kv_out)
        if cfg.qk_norm:
            layers['q_norm'] = (L, D)
            layers['k_norm'] = (L, D)
        if getattr(self, 'sandwich_norms', False):
            # block-output norms before the residual add (glm4, gemma2)
            layers['post_attn_norm'] = (L, H)
            layers['post_mlp_norm'] = (L, H)
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
        import jax as _jax
        dtype = self.config.jnp_dtype()

        def make(path, shape):
            name = path[-1]
            if isinstance(shape, _jax.ShapeDtypeStruct):
                if rng is None or shape.dtype in (jnp.uint8, jnp.int8,
                                                  jnp.int32):
                    base = jnp.zeros(shape.shape, shape.dtype)
                    if rng is not None and shape.dtype == jnp.uint8:
                        key = _jax.random.fold_in(rng, len(name))
                        base = _jax.random.randint(key, shape.shape, 0, 255,
                                                   jnp.int32).astype(jnp.uint8)
                    elif rng is not None and shape.dtype == jnp.int32:
                        # plane-packed W4 words: any bit pattern is a valid
                        # nibble set (benchmarks stream realistic bytes)
                        key = _jax.random.fold_in(rng, len(name))
                        base = _jax.random.randint(
                            key, shape.shape, jnp.iinfo(jnp.int32).min,
                            jnp.iinfo(jnp.int32).max, jnp.int32)
                    return base
                return jnp.full(shape.shape, 0.01, shape.dtype)   # scales/zeros
            if rng is None:
                return jnp.zeros(shape, dtype)
            if 'norm' in name:
                return jnp.ones(shape, dtype)
            import zlib
            key = _jax.random.fold_in(rng, zlib.crc32('/'.join(map(str, path)).encode()))
            return (_jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)

        def walk(tree, path):
            out = {}
            for k, v in tree.items():
                if isinstance(v, dict):
                    out[k] = walk(v, path + (k,))
                else:
                    out[k] = make(path + (k,), v)
            return out

        params = walk(self.param_shapes(), ())
        for path, value in (getattr(self, 'constant_params', lambda: {})()
                            or {}).items():
            node = params
            for kpart in path[:-1]:
                node = node[kpart]
            node[path[-1]] = jnp.asarray(value)
        return params

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

        hf_linears = [
            ('self_attn.q_proj', 'wq'), ('self_attn.k_proj', 'wk'),
            ('self_attn.v_proj', 'wv'), ('self_attn.o_proj', 'wo'),
            ('mlp.gate_proj', 'w_gate'), ('mlp.up_proj', 'w_up'),
            ('mlp.down_proj', 'w_down'),
        ]
        per_layer = [
            ('model.layers.{}.input_layernorm.weight', ('layers', 'attn_norm'), ident, None),
            ('model.layers.{}.post_attention_layernorm.weight', ('layers', 'mlp_norm'),
             ident, None),
            ('model.layers.{}.self_attn.q_proj.bias', ('layers', 'bq'), ident, None),
            ('model.layers.{}.self_attn.k_proj.bias', ('layers', 'bk'), ident, None),
            ('model.layers.{}.self_attn.v_proj.bias', ('layers', 'bv'), ident, None),
            ('model.layers.{}.self_attn.q_norm.weight', ('layers', 'q_norm'), ident, None),
            ('model.layers.{}.self_attn.k_norm.weight', ('layers', 'k_norm'), ident, None),
        ]
        if self.quant_method == 'w4a16':
            import functools as _ft

            from ..lite import formats
            fmt = (cfg.quantization_config or {}).get('quant_method', 'awq')
            if fmt == 'gptq':
                unpack_w = formats.gptq_qweight_to_kernel
                unpack_z = formats.unpack_gptq_qzeros
            else:
                unpack_w = formats.awq_qweight_to_kernel
                unpack_z = formats.unpack_awq_qzeros
            gs = self.group_size
            k_in = {'wq': cfg.hidden_size, 'wk': cfg.hidden_size,
                    'wv': cfg.hidden_size, 'wo': q_out,
                    'w_gate': cfg.hidden_size, 'w_up': cfg.hidden_size,
                    'w_down': I}
            for hf, name in hf_linears:
                kp = formats.pad_k4(k_in[name], gs)

                def pad_s(x, g=kp // gs):
                    return formats.pad_groups(x.astype('float32'), g, 1.0)

                def pad_z(x, g=kp // gs, uz=unpack_z):
                    return formats.pad_groups(uz(x), g, 0.0)

                per_layer += [
                    (f'model.layers.{{}}.{hf}.qweight', ('layers', name, 'packed'),
                     _ft.partial(unpack_w, pad_to=kp), None),
                    (f'model.layers.{{}}.{hf}.scales', ('layers', name, 'scales'),
                     pad_s, None),
                    (f'model.layers.{{}}.{hf}.qzeros', ('layers', name, 'zeros'),
                     pad_z, None),
                ]
        elif self.quant_method == 'w8a8':
            for hf, name in hf_linears:
                per_layer += [
                    (f'model.layers.{{}}.{hf}.weight', ('layers', name, 'w8'),
                     lambda x: np.ascontiguousarray(x.T).astype(np.int8), None),
                    (f'model.layers.{{}}.{hf}.scale', ('layers', name, 'scale'),
                     lambda x: x.reshape(-1).astype('float32'), None),
                ]
        elif self.quant_method == 'fp8':
            import ml_dtypes

            def fp8_T(x):
                return np.ascontiguousarray(
                    np.swapaxes(x, -1, -2)).astype(ml_dtypes.float8_e4m3fn)

            N_out = {'wq': q_out, 'wk': kv_out, 'wv': kv_out,
                     'wo': cfg.hidden_size, 'w_gate': I, 'w_up': I,
                     'w_down': cfg.hidden_size}

            def scale_vec(name):
                def f(x):   # [N,1] per-channel or scalar per-tensor
                    v = np.asarray(x, np.float32).reshape(-1)
                    if v.size == 1:
                        v = np.full(N_out[name], v[0], np.float32)
                    return v
                return f

            for hf, name in hf_linears:
                per_layer += [
                    (f'model.layers.{{}}.{hf}.weight', ('layers', name, 'w8'),
                     fp8_T, None),
                    (f'model.layers.{{}}.{hf}.weight_scale',
                     ('layers', name, 'scale'), scale_vec(name), None),
                ]
        elif self.quant_method == 'fp8_blocked':
            import ml_dtypes

            def fp8_T(x):
                return np.ascontiguousarray(
                    np.swapaxes(x, -1, -2)).astype(ml_dtypes.float8_e4m3fn)

            def scale_T(x):   # [Nb, Kb] -> [Kb, Nb]
                return np.ascontiguousarray(
                    np.swapaxes(np.asarray(x, np.float32), -1, -2))

            for hf, name in hf_linears:
                per_layer += [
                    (f'model.layers.{{}}.{hf}.weight', ('layers', name, 'w8'),
                     fp8_T, None),
                    (f'model.layers.{{}}.{hf}.weight_scale_inv',
                     ('layers', name, 'bscale'), scale_T, None),
                ]
        else:
            for hf, name in hf_linears:
                per_layer.append((f'model.layers.{{}}.{hf}.weight',
                                  ('layers', name), T, None))
        for key_fmt, path, transform, col in per_layer:
            for layer in range(cfg.num_layers):
                plan[key_fmt.format(layer)] = (path + (layer,), transform, col)
        return plan

    # -- mlp (overridden by MoE variants) ----------------------------------------------
    def _gather_rope(self, rope_cos, rope_sin, positions):
        """Hook: positions [B,T] -> (cos, sin) [B,T,D/2].  Mrope models
        (Qwen2-VL) override to accept [B,T,3] multimodal position ids."""
        return rope_cos[positions], rope_sin[positions]

    def _apply_rope(self, q, k, cos, sin, w=None):
        """Hook for models with non-standard rotary application (partial
        rotary, interleaved layouts, per-layer table selection — ``w`` is
        the current layer's weight slice)."""
        return apply_rope(q, k, cos, sin)

    def _mlp(self, w, x: jax.Array) -> jax.Array:
        from ..nn.linear import linear as proj
        # silu runs per-element in f32 but the [*, I] intermediates stay in
        # x.dtype: materializing two f32 [B, T, I] activation buffers per layer
        # was ~0.5 ms/layer of pure HBM traffic at [2, 2048] prefill
        if 'w_gateup' in w:
            I = self.config.intermediate_size
            gu = proj(x, w['w_gateup'])
            act = jax.nn.silu(gu[..., :I].astype(jnp.float32)).astype(x.dtype)
            act = act * gu[..., I:]
            return proj(act, w['w_down'])
        act = jax.nn.silu(proj(x, w['w_gate']).astype(jnp.float32)
                          ).astype(x.dtype)
        act = act * proj(x, w['w_up'])
        return proj(act, w['w_down'])

    # -- load-time projection fusion ---------------------------------------------------
    def fuse_projections(self, params):
        """Concatenate wq/wk/wv -> wqkv and w_gate/w_up -> w_gateup along the
        output dim (single-chip, no-LoRA serving).  Works for dense leaves and
        for quant leaf dicts (packed/scales/zeros, w8/scale, ...) because every
        quant layout packs along K and keeps N as the trailing axis.  Reference
        analog: turbomind fuses qkv/gate-up at weight-conversion time
        (src/turbomind/models/llama/LlamaDenseWeight.h).  The inverse
        (``unfuse_projections``) restores per-name leaves for S-LoRA and
        in-place weight updates."""
        # only the stock LlamaModel.forward knows the fused names; models with
        # their own attention stacks (MLA, hybrid linear-attention, ...) keep
        # per-name leaves
        if type(self).forward is not LlamaModel.forward \
                or 'layers' not in params:
            return params
        lp = dict(params['layers'])

        def cat(names):
            leaves = [lp.get(n) for n in names]
            if any(v is None for v in leaves):
                return None
            if all(isinstance(v, dict) for v in leaves):
                keys = set(leaves[0])
                if any(set(v) != keys for v in leaves):
                    return None
                if 'bscale' in keys:
                    # blocked-fp8 scale grids don't concat/slice cleanly when
                    # N is not a multiple of the block — leave unfused
                    return None
                return {k: jnp.concatenate([v[k] for v in leaves], axis=-1)
                        for k in keys}
            if all(not isinstance(v, dict) for v in leaves):
                return jnp.concatenate(leaves, axis=-1)
            return None

        qkv = cat(['wq', 'wk', 'wv'])
        if qkv is not None:
            lp['wqkv'] = qkv
            for n in ('wq', 'wk', 'wv'):
                del lp[n]
            if 'bq' in lp:
                lp['bqkv'] = jnp.concatenate(
                    [lp.pop('bq'), lp.pop('bk'), lp.pop('bv')], axis=-1)
        if type(self)._mlp is LlamaModel._mlp:
            gu = cat(['w_gate', 'w_up'])
            if gu is not None:
                lp['w_gateup'] = gu
                del lp['w_gate'], lp['w_up']
        return dict(params, layers=lp)

    def prep_quant_leaves(self, params, fast: bool = False,
                          mode: str | None = None):
        """Convert w4a16 leaves to the stacked-kernel 'prepared' format
        {'packed','sb','corr'} (ops/pallas/quant_matmul.py round-5 design):
        the layer scan then closes over the full stacks and injects a traced
        layer index, so the Pallas kernel streams weights with no per-layer
        slice copy.  Only models running the stock LlamaModel.forward opt in
        (same gate as fuse_projections); only 3-D [L, G, N] leaves convert.
        """
        if type(self).forward is not LlamaModel.forward \
                or 'layers' not in params:
            return params
        from ..ops.pallas.quant_matmul import prep_w4
        lp = dict(params['layers'])
        for name, leaf in lp.items():
            if (isinstance(leaf, dict) and 'packed' in leaf
                    and 'scales' in leaf and leaf['packed'].ndim == 3):
                sb, corr = prep_w4(leaf['scales'], leaf['zeros'], not fast,
                                   mode=mode)
                lp[name] = {'packed': leaf['packed'], 'sb': sb, 'corr': corr}
        return dict(params, layers=lp)

    def unfuse_projections(self, params):
        """Inverse of fuse_projections (slices the concatenated leaves)."""
        if not isinstance(params, dict) or 'layers' not in params:
            return params                    # offloaded (sleep level 2) / custom tree
        lp = dict(params['layers'])

        def split(v, bounds):
            if isinstance(v, dict):
                return [{k: a[..., lo:hi] for k, a in v.items()}
                        for lo, hi in bounds]
            return [v[..., lo:hi] for lo, hi in bounds]

        if 'wqkv' in lp:
            qo, ko = self.q_out, self.kv_out
            bounds = [(0, qo), (qo, qo + ko), (qo + ko, qo + 2 * ko)]
            lp['wq'], lp['wk'], lp['wv'] = split(lp.pop('wqkv'), bounds)
            if 'bqkv' in lp:
                lp['bq'], lp['bk'], lp['bv'] = split(lp.pop('bqkv'), bounds)
        if 'w_gateup' in lp:
            I = self.config.intermediate_size
            lp['w_gate'], lp['w_up'] = split(lp.pop('w_gateup'),
                                             [(0, I), (I, 2 * I)])
        return dict(params, layers=lp)

    def _norm(self, x: jax.Array, weight: jax.Array,
              bias: Optional[jax.Array], eps: float) -> jax.Array:
        """Pre/post-layer normalization hook (default RMSNorm; LayerNorm
        models override — e.g. starcoder2)."""
        return rms_norm(x, weight, eps)

    def _qkv_proj(self, w, lw, x, lin, has_bias):
        """Attention input projections hook (cogvlm's dual experts
        override).  Returns flat (q, k, v)."""
        if 'wqkv' in w:
            # load-time fused qkv (single-chip, no LoRA): one fat GEMM
            # instead of three skinny ones — the N=kv_out projections are
            # too narrow to reach kernel bandwidth on their own
            from ..nn.linear import linear as proj
            qkv = proj(x, w['wqkv'], w.get('bqkv'))
            q = qkv[..., :self.q_out]
            k = qkv[..., self.q_out:self.q_out + self.kv_out]
            v = qkv[..., self.q_out + self.kv_out:]
            return q, k, v
        q = lin(x, w, lw, 'wq', w.get('bq') if has_bias else None)
        k = lin(x, w, lw, 'wk', w.get('bk') if has_bias else None)
        v = lin(x, w, lw, 'wv', w.get('bv') if has_bias else None)
        return q, k, v

    def _o_proj(self, w, lw, attn, lin):
        """Attention output projection hook."""
        return lin(attn, w, lw, 'wo', w.get('bo'))

    def _head(self, params, x: jax.Array) -> jax.Array:
        """Hidden -> output logits.  Reward models override with their
        score head (reference: qwen2_reward.py get_logits)."""
        lm_head = params.get('lm_head')
        if lm_head is None:
            lm_head = params['embed'].T
        logits = jnp.dot(x, lm_head, preferred_element_type=jnp.float32)
        if self.final_logit_softcap:
            cap = self.final_logit_softcap
            logits = jnp.tanh(logits / cap) * cap
        return logits

    # -- forward -----------------------------------------------------------------------
    def forward(self, params, input_ids: jax.Array, positions: jax.Array,
                kv_cache: jax.Array, meta: AttnMeta,
                rope_cos: jax.Array, rope_sin: jax.Array,
                return_all_logits: bool = False,
                fresh_prefill: bool = False,
                input_embeds: Optional[jax.Array] = None,
                embeds_mask: Optional[jax.Array] = None,
                adapter_ids: Optional[jax.Array] = None,
                return_hidden: bool = False,
                return_aux_hidden: bool = False,
                ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """One forward step.

        Args:
          input_ids: [B, T] (T==1 for decode)
          positions: [B, T] absolute positions (padding rows clamped in-range)
          kv_cache: [L, NB, BS, ROWp] unified per-head-interleaved pages
          rope_cos/rope_sin: full tables [max_len, D/2]
          input_embeds/embeds_mask: optional [B,T,H]/[B,T] multimodal override —
            rows where the mask is set take ``input_embeds`` instead of the token
            embedding (VLM image features; reference: vl_async_engine prefill).
        Returns (logits, kv_cache); logits is [B, V] at each row's last valid
        token, or [B, T, V] when return_all_logits.
        """
        cfg = self.config
        B, T = input_ids.shape
        D = cfg.head_dim
        scale = self.attn_scale or 1.0 / math.sqrt(D)
        block_size = kv_cache.shape[3]

        hidden = params['embed'][input_ids].astype(cfg.jnp_dtype())   # [B,T,H]
        if self.embed_scale != 1.0:
            hidden = hidden * jnp.asarray(self.embed_scale, hidden.dtype)
        deepstack = None
        if input_embeds is not None and \
                input_embeds.shape[-1] > cfg.hidden_size:
            # Qwen3-VL deepstack: the feature spans carry K extra per-layer
            # visual embeddings (width (1+K)*H); layer i < K adds slice i at
            # visual positions after its block (reference: qwen3_vl.py
            # _deepstack_process)
            K = input_embeds.shape[-1] // cfg.hidden_size - 1
            ds = input_embeds[..., cfg.hidden_size:].reshape(
                B, T, K, cfg.hidden_size)
            deepstack = jnp.where(embeds_mask[..., None, None],
                                  ds.astype(hidden.dtype), 0)
            input_embeds = input_embeds[..., :cfg.hidden_size]
        if input_embeds is not None:
            hidden = jnp.where(embeds_mask[..., None],
                               input_embeds.astype(hidden.dtype), hidden)
        cos, sin = self._gather_rope(rope_cos, rope_sin, positions)  # [B,T,D/2]
        slot_mapping = compute_slot_mapping(meta.block_tables, meta.history_lens,
                                            meta.q_lens, T, block_size)
        bidir_chunk = None
        if self.bidir_image_token is not None and T > 1:
            bidir_chunk = input_ids == jnp.int32(self.bidir_image_token)

        lp = params['layers']
        has_bias = 'bq' in lp
        has_qknorm = 'q_norm' in lp
        # prepared w4a16 stacks (prep_quant_leaves) stay OUT of the scan xs:
        # scan slicing would materialize a per-layer copy before the Pallas
        # custom-call.  The layer body re-injects them whole, tagged with the
        # carried layer index, and the stacked kernel offsets its DMAs.
        qstacks = {k: v for k, v in lp.items()
                   if isinstance(v, dict) and 'sb' in v and 'packed' in v
                   and v['packed'].ndim == 3}
        if qstacks:
            lp = {k: v for k, v in lp.items() if k not in qstacks}
        # S-LoRA: slot stacks attached by the agent as params['lora'] ride the
        # same layer scan; per-row adapter_ids gather each row's low-rank pair.
        lora = params.get('lora')

        from ..nn.linear import linear as proj

        def lin(x_, w, lw, name, bias=None):
            y = proj(x_, w[name], bias)
            if lw is not None and name in lw:
                a = lw[name]['a'][adapter_ids]                 # [B, in, rp]
                b = lw[name]['b'][adapter_ids]                 # [B, rp, out]
                t = jnp.einsum('bth,bhr->btr', x_.astype(jnp.float32), a)
                y = y + jnp.einsum('btr,bro->bto', t, b).astype(y.dtype)
            return y

        # The FULL caches ride in the scan carry; each layer scatters its new KV into
        # its own region (layer-offset slots) and the attention kernels index the
        # region directly.  This keeps the cache update truly in-place — slicing a
        # layer's cache out and re-inserting it would make XLA allocate a second
        # full-cache buffer for the scan outputs.
        def layer_fn(carry, xs):
            w, lw = xs if lora is not None else (xs, None)
            h, kv_cache, layer = carry
            if qstacks:
                w = dict(w)
                for k, st in qstacks.items():
                    w[k] = dict(st, layer=layer)
            x = self._norm(h, w['attn_norm'], w.get('attn_norm_b'),
                           cfg.rms_norm_eps)
            q, k, v = self._qkv_proj(w, lw, x, lin, has_bias)
            q = q.reshape(B, T, cfg.num_attention_heads, D)
            k = k.reshape(B, T, cfg.num_key_value_heads, D)
            v = v.reshape(B, T, cfg.num_key_value_heads, D)
            if has_qknorm:
                q = rms_norm(q, w['q_norm'], cfg.rms_norm_eps)
                k = rms_norm(k, w['k_norm'], cfg.rms_norm_eps)
            q, k = self._apply_rope(q, k, cos, sin, w)
            kv_cache = fill_kv_cache(kv_cache, k.reshape(B * T, -1, D),
                                     v.reshape(B * T, -1, D),
                                     slot_mapping, layer,
                                     page_tables=meta.block_tables
                                     if fresh_prefill else None)
            window = w['layer_window'] if 'layer_window' in w \
                else cfg.sliding_window
            attn = paged_attention(q, kv_cache, meta.block_tables,
                                   meta.history_lens, meta.q_lens, scale, layer,
                                   cfg.num_key_value_heads,
                                   logit_softcap=self.attn_logit_softcap,
                                   window_size=window,
                                   chunk_kv=(k, v), fresh_prefill=fresh_prefill,
                                   force_reference=getattr(
                                       self, 'force_ref_attention', False),
                                   sinks=w.get('sinks'),
                                   block_causal=self.block_causal_size,
                                   bidir_chunk=bidir_chunk,
                                   cp_mesh=getattr(self, 'cp_mesh', None))
            attn = attn.reshape(B, T, self.q_out)
            out = self._o_proj(w, lw, attn, lin)
            if 'post_attn_norm' in w:
                out = rms_norm(out, w['post_attn_norm'], cfg.rms_norm_eps)
            if self.residual_scale is not None:
                out = out * jnp.asarray(self.residual_scale, out.dtype)
            h = h + out
            x = self._norm(h, w['mlp_norm'], w.get('mlp_norm_b'),
                           cfg.rms_norm_eps)
            if lw is not None and 'w_gate' in w:
                act = jax.nn.silu(lin(x, w, lw, 'w_gate').astype(jnp.float32))
                act = act * lin(x, w, lw, 'w_up').astype(jnp.float32)
                out = lin(act.astype(x.dtype), w, lw, 'w_down')
            else:
                out = self._mlp(w, x)
            if 'post_mlp_norm' in w:
                out = rms_norm(out, w['post_mlp_norm'], cfg.rms_norm_eps)
            if self.residual_scale is not None:
                out = out * jnp.asarray(self.residual_scale, out.dtype)
            h = h + out
            if deepstack is not None:
                dsK = deepstack.shape[2]
                dsl = jnp.take(deepstack, jnp.clip(layer, 0, dsK - 1), axis=2)
                h = h + jnp.where(layer < dsK, dsl, 0)
            ys = h if return_aux_hidden else None
            return (h, kv_cache, layer + 1), ys

        xs = lp if lora is None else (lp, lora)
        import os as _os
        unroll = int(_os.environ.get('LMDEPLOY_TPU_SCAN_UNROLL', '1'))
        (hidden, kv_cache, _), layer_hs = jax.lax.scan(
            layer_fn, (hidden, kv_cache, jnp.int32(0)), xs,
            unroll=min(unroll, cfg.num_layers) if unroll > 1 else 1)
        if return_aux_hidden:
            idx = np.clip(np.asarray(self.aux_hidden_layers, np.int32),
                          0, cfg.num_layers - 1)
            aux_hidden = jnp.concatenate(
                [layer_hs[i] for i in idx], axis=-1)       # [B, T, 3H]
        hidden_prenorm = hidden        # EAGLE conditions on pre-final-norm features
        hidden = self._norm(hidden, params['final_norm'],
                            params.get('final_norm_b'), cfg.rms_norm_eps)

        def head(x):
            return self._head(params, x)

        if return_all_logits:
            if return_aux_hidden:
                return head(hidden), kv_cache, aux_hidden
            if return_hidden:
                return head(hidden), kv_cache, hidden_prenorm
            return head(hidden), kv_cache
        last_idx = jnp.maximum(meta.q_lens - 1, 0)
        last_hidden = jnp.take_along_axis(
            hidden, last_idx[:, None, None], axis=1)[:, 0]            # [B,H]
        if return_hidden:
            # memdecode router conditions on the sampled position's features
            last_pre = jnp.take_along_axis(
                hidden_prenorm, last_idx[:, None, None], axis=1)[:, 0]
            return head(last_hidden), kv_cache, last_pre
        return head(last_hidden), kv_cache
