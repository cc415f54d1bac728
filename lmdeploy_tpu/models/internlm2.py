"""InternLM2/3 causal LM: llama-family compute, distinct checkpoint naming.

Reference analog: ``lmdeploy/pytorch/models/internlm2.py``.  The checkpoint packs
q/k/v as one ``attention.wqkv`` tensor grouped per kv head
([Hkv, G+2, D, H] row-major: G query heads, then one K row, one V row per group);
the loader splits it into this framework's wq/wk/wv at load time.
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from .llama import LlamaModel


class InternLM2Model(LlamaModel):

    def make_assign_plan(self):
        cfg = self.config
        Hkv = cfg.num_key_value_heads
        G = cfg.num_attention_heads // Hkv
        D = cfg.head_dim
        H = cfg.hidden_size

        def T(x):
            return np.ascontiguousarray(np.swapaxes(x, -1, -2))

        def split_q(x):   # wqkv [ (Hkv*(G+2)*D), H ] -> wq [H, Hq*D]
            g = x.reshape(Hkv, G + 2, D, H)
            return T(g[:, :G].reshape(Hkv * G * D, H))

        def split_k(x):
            g = x.reshape(Hkv, G + 2, D, H)
            return T(g[:, G].reshape(Hkv * D, H))

        def split_v(x):
            g = x.reshape(Hkv, G + 2, D, H)
            return T(g[:, G + 1].reshape(Hkv * D, H))

        ident = lambda x: x  # noqa: E731
        plan: Dict[str, object] = {
            'model.tok_embeddings.weight': (('embed',), ident, None),
            'model.norm.weight': (('final_norm',), ident, None),
        }
        if not cfg.tie_word_embeddings:
            plan['output.weight'] = (('lm_head',), T, None)
        for l in range(cfg.num_layers):
            p = f'model.layers.{l}.'
            plan[p + 'attention_norm.weight'] = (('layers', 'attn_norm', l), ident, None)
            plan[p + 'ffn_norm.weight'] = (('layers', 'mlp_norm', l), ident, None)
            plan[p + 'attention.wqkv.weight'] = [
                (('layers', 'wq', l), split_q, None),
                (('layers', 'wk', l), split_k, None),
                (('layers', 'wv', l), split_v, None),
            ]
            plan[p + 'attention.wo.weight'] = (('layers', 'wo', l), T, None)
            plan[p + 'feed_forward.w1.weight'] = (('layers', 'w_gate', l), T, None)
            plan[p + 'feed_forward.w3.weight'] = (('layers', 'w_up', l), T, None)
            plan[p + 'feed_forward.w2.weight'] = (('layers', 'w_down', l), T, None)
        return plan
