"""Phi-3 / Phi-3.5 / Phi-4 mini family.

Reference analog: ``lmdeploy/pytorch/models/phi3.py`` (packed qkv_proj /
gate_up_proj splits ``:365``) — llama-family compute with fused checkpoint
tensors and LongRoPE position scaling (handled by nn/layers.make_rope_table
'longrope' branch).
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from .llama import LlamaModel


class Phi3Model(LlamaModel):

    def make_assign_plan(self):
        cfg = self.config
        q_out, kv_out = self.q_out, self.kv_out
        I = cfg.intermediate_size

        def T(x):
            return np.ascontiguousarray(np.swapaxes(x, -1, -2))

        def split_q(x):   # qkv_proj [(q_out+2*kv_out), H]
            return T(x[:q_out])

        def split_k(x):
            return T(x[q_out:q_out + kv_out])

        def split_v(x):
            return T(x[q_out + kv_out:])

        def split_gate(x):  # gate_up_proj [2I, H]: gate rows then up rows
            return T(x[:I])

        def split_up(x):
            return T(x[I:])

        ident = lambda x: x  # noqa: E731
        plan: Dict[str, object] = {
            'model.embed_tokens.weight': (('embed',), ident, None),
            'model.norm.weight': (('final_norm',), ident, None),
        }
        if not cfg.tie_word_embeddings:
            plan['lm_head.weight'] = (('lm_head',), T, None)
        for l in range(cfg.num_layers):
            p = f'model.layers.{l}.'
            plan[p + 'input_layernorm.weight'] = (('layers', 'attn_norm', l),
                                                  ident, None)
            plan[p + 'post_attention_layernorm.weight'] = \
                (('layers', 'mlp_norm', l), ident, None)
            plan[p + 'self_attn.qkv_proj.weight'] = [
                (('layers', 'wq', l), split_q, None),
                (('layers', 'wk', l), split_k, None),
                (('layers', 'wv', l), split_v, None),
            ]
            plan[p + 'self_attn.o_proj.weight'] = (('layers', 'wo', l), T, None)
            plan[p + 'mlp.gate_up_proj.weight'] = [
                (('layers', 'w_gate', l), split_gate, None),
                (('layers', 'w_up', l), split_up, None),
            ]
            plan[p + 'mlp.down_proj.weight'] = (('layers', 'w_down', l), T, None)
        return plan
