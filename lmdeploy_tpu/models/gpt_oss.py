"""gpt-oss (20B / 120B) MoE family.

Reference analog: ``lmdeploy/pytorch/models/gpt_oss.py`` and the MXFP4 expert
path (``lmdeploy/pytorch/nn/moe/v4_fp4.py``).  Distinctives, all handled here:

  * attention sinks — a learned per-head logit joins each softmax denominator
    (``s_aux`` in the reference kernels); carried as per-layer 'sinks' weights
    through the scan and applied by ops/attention.
  * alternating sliding/full attention — config ``layer_types``; the per-layer
    window rides the scan as a constant 'layer_window' i32 (traced scalar per
    layer; <= 0 means full attention).
  * clamped SwiGLU — gate clamped to <= limit, up to +-limit,
    act = (up + 1) * gate * sigmoid(1.702 * gate)  (GateupAct in the reference).
  * router: top-k over logits (+ bias) then softmax over the k chosen logits.
  * biases everywhere: qkv/o projections and every expert matmul.
  * MXFP4 checkpoints: expert weights stored as e2m1 nibbles with ue8m0 block
    scales (32-value groups); kept MXFP4-resident in HBM ({'nib','scale'}
    leaves, 0.625 B/element) and dequantized tile-by-tile inside
    ops/pallas/quant_bmm.py (reference analog: nn/moe/v4_fp4.py +
    kernels/gemm/convert_v3.cu).  LMDEPLOY_TPU_MXFP4_DEQUANT=1 falls back to
    load-time dequantization to the compute dtype (lite/formats.mxfp4_dequant).
"""
from __future__ import annotations

import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from .llama import LlamaModel


class GptOssModel(LlamaModel):

    def __init__(self, config):
        super().__init__(config)
        hf = config.hf_config or {}
        self.swiglu_limit = float(hf.get('swiglu_limit', 7.0))
        lt = hf.get('layer_types')
        if not lt:
            lt = ['sliding_attention' if i % 2 == 0 else 'full_attention'
                  for i in range(config.num_layers)]
        self.layer_windows = np.asarray(
            [config.sliding_window or 128 if t == 'sliding_attention' else 0
             for t in lt], np.int32)
        qcfg = config.quantization_config or {}
        Ie = config.moe_intermediate_size or config.intermediate_size
        # half-split nibble packing needs 64 | K on both expert GEMM axes
        self.moe_mxfp4 = (qcfg.get('quant_method') == 'mxfp4'
                          and config.hidden_size % 64 == 0 and Ie % 64 == 0
                          and os.environ.get('LMDEPLOY_TPU_MXFP4_DEQUANT')
                          != '1')

    # -- parameters --------------------------------------------------------------------
    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        cfg = self.config
        L, H = cfg.num_layers, cfg.hidden_size
        E = cfg.num_experts
        Ie = cfg.moe_intermediate_size or cfg.intermediate_size
        layers = shapes['layers']
        for name in ('w_gate', 'w_up', 'w_down'):
            layers.pop(name, None)
        layers.update(
            bo=(L, H),                      # o_proj bias
            sinks=(L, cfg.num_attention_heads),
            layer_window=(L,),
            router=(L, H, E),
            router_bias=(L, E),
            bg=(L, E, Ie), bu=(L, E, Ie), bd=(L, E, H),
        )
        if self.moe_mxfp4:
            def qleaf(K, N):
                return {'nib': jax.ShapeDtypeStruct((L, E, K // 2, N),
                                                    jnp.uint8),
                        'scale': jax.ShapeDtypeStruct((L, E, K // 32, N),
                                                      jnp.float32)}
            layers.update(we_gate=qleaf(H, Ie), we_up=qleaf(H, Ie),
                          we_down=qleaf(Ie, H))
        else:
            layers.update(we_gate=(L, E, H, Ie), we_up=(L, E, H, Ie),
                          we_down=(L, E, Ie, H))
        return shapes

    def constant_params(self):
        return {('layers', 'layer_window'): self.layer_windows}

    # -- MoE mlp -----------------------------------------------------------------------
    def _mlp(self, w, x: jax.Array) -> jax.Array:
        from ..ops.moe import eplb_remap, moe_ffn
        cfg = self.config
        k = cfg.num_experts_per_tok
        limit = self.swiglu_limit
        B, T, H = x.shape
        xf = x.reshape(B * T, H)

        logits = jnp.dot(xf, w['router'], preferred_element_type=jnp.float32)
        logits = logits + w['router_bias'][None, :]
        top_vals, top_idx = jax.lax.top_k(logits, k)
        top_w = jax.nn.softmax(top_vals, axis=-1)

        def act(gate, up):
            gate = jnp.minimum(gate, limit)
            up = jnp.clip(up, -limit, limit)
            glu = gate * jax.nn.sigmoid(gate * 1.702)
            return (up + 1.0) * glu

        top_idx = eplb_remap(w, top_idx)
        out = moe_ffn(xf, top_idx, top_w, w['we_gate'], w['we_up'],
                      w['we_down'], x.dtype,
                      allow_ragged=not getattr(self, 'ep_sharded', False),
                      biases=(w['bg'], w['bu'], w['bd']), act=act)
        return out.reshape(B, T, H).astype(x.dtype)

    # -- HF weight mapping -------------------------------------------------------------
    def make_assign_plan(self):
        cfg = self.config
        E = cfg.num_experts

        def T(x):
            return np.ascontiguousarray(np.swapaxes(x, -1, -2))

        ident = lambda x: x  # noqa: E731
        plan: Dict[str, Any] = {
            'model.embed_tokens.weight': (('embed',), ident, None),
            'model.norm.weight': (('final_norm',), ident, None),
        }
        if not cfg.tie_word_embeddings:
            plan['lm_head.weight'] = (('lm_head',), T, None)

        
        def gate_rows(x):      # [E, H, 2Ie] -> [E, H, Ie] (interleaved ::2)
            return np.ascontiguousarray(x[..., 0::2])

        def up_rows(x):
            return np.ascontiguousarray(x[..., 1::2])

        for l in range(cfg.num_layers):
            p = f'model.layers.{l}.'
            plan[p + 'input_layernorm.weight'] = (('layers', 'attn_norm', l),
                                                  ident, None)
            plan[p + 'post_attention_layernorm.weight'] = \
                (('layers', 'mlp_norm', l), ident, None)
            for hf, name in (('q_proj', 'wq'), ('k_proj', 'wk'),
                             ('v_proj', 'wv'), ('o_proj', 'wo')):
                plan[p + f'self_attn.{hf}.weight'] = (('layers', name, l), T,
                                                      None)
            plan[p + 'self_attn.q_proj.bias'] = (('layers', 'bq', l), ident, None)
            plan[p + 'self_attn.k_proj.bias'] = (('layers', 'bk', l), ident, None)
            plan[p + 'self_attn.v_proj.bias'] = (('layers', 'bv', l), ident, None)
            plan[p + 'self_attn.o_proj.bias'] = (('layers', 'bo', l), ident, None)
            plan[p + 'self_attn.sinks'] = (('layers', 'sinks', l), ident, None)
            plan[p + 'mlp.router.weight'] = (('layers', 'router', l), T, None)
            plan[p + 'mlp.router.bias'] = (('layers', 'router_bias', l), ident,
                                           None)
            # bf16 release: fused [E, H, 2Ie] gate/up interleaved on last dim
            plan[p + 'mlp.experts.gate_up_proj'] = [
                (('layers', 'we_gate', l), gate_rows, None),
                (('layers', 'we_up', l), up_rows, None),
            ]
            plan[p + 'mlp.experts.gate_up_proj_bias'] = [
                (('layers', 'bg', l), gate_rows, None),
                (('layers', 'bu', l), up_rows, None),
            ]
            plan[p + 'mlp.experts.down_proj'] = (('layers', 'we_down', l),
                                                 ident, None)
            plan[p + 'mlp.experts.down_proj_bias'] = (('layers', 'bd', l),
                                                      ident, None)
        return plan

    def load_hook(self, name: str, tensor, params_np):
        """MXFP4 checkpoint tensors (``*_blocks`` + ``*_scales``) need both
        halves before dequantizing; the loader calls this for unmatched names.

        Returns True when the tensor was consumed."""
        if not (name.endswith('_blocks') or name.endswith('_scales')):
            return False
        stash = self.__dict__.setdefault('_mx_stash', {})
        base = name.rsplit('_', 1)[0]
        kind = name.rsplit('_', 1)[1]
        stash.setdefault(base, {})[kind] = np.asarray(tensor)
        pair = stash[base]
        if 'blocks' not in pair or 'scales' not in pair:
            return True
        blocks, scales = pair.pop('blocks'), pair.pop('scales')
        stash.pop(base, None)
        # base: model.layers.{l}.mlp.experts.{gate_up|down}_proj
        parts = base.split('.')
        l = int(parts[2])
        proj = parts[-1]
        if self.moe_mxfp4:
            # keep e2m1 codes + f32 group scales in the kernel layout
            # (codes [E, rows_out, K] -> [E, K, rows_out] -> half-split pack)
            from ..lite.formats import mxfp4_codes, pack_halfsplit, ue8m0_to_f32
            codes = np.swapaxes(mxfp4_codes(blocks), -1, -2)
            sc = np.swapaxes(ue8m0_to_f32(scales), -1, -2)   # [E, K/32, rows]
            if proj == 'gate_up_proj':
                params_np['layers']['we_gate']['nib'][l] = \
                    pack_halfsplit(codes[..., 0::2])
                params_np['layers']['we_up']['nib'][l] = \
                    pack_halfsplit(codes[..., 1::2])
                params_np['layers']['we_gate']['scale'][l] = sc[..., 0::2]
                params_np['layers']['we_up']['scale'][l] = sc[..., 1::2]
            else:
                params_np['layers']['we_down']['nib'][l] = pack_halfsplit(codes)
                params_np['layers']['we_down']['scale'][l] = sc
            return True
        from ..lite.formats import mxfp4_dequant
        dense = mxfp4_dequant(blocks, scales)
        if proj == 'gate_up_proj':
            # dequantized as [E, 2Ie, H] (row-major nibble groups along H);
            # transpose to [E, H, 2Ie] then de-interleave
            dense = np.swapaxes(dense, -1, -2)
            params_np['layers']['we_gate'][l] = \
                np.ascontiguousarray(dense[..., 0::2])
            params_np['layers']['we_up'][l] = \
                np.ascontiguousarray(dense[..., 1::2])
        else:
            # [E, H, Ie] -> [E, Ie, H]
            params_np['layers']['we_down'][l] = np.swapaxes(dense, -1, -2)
        return True
