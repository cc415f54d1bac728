"""ChatGLM2 / ChatGLM3 / GLM-4 (legacy "THUDM" checkpoint format).

Reference analog: ``lmdeploy/pytorch/models/chatglm2.py`` +
``configurations/chatglm.py``.  Compute-wise this IS the GLM-4 dense family
WITHOUT sandwich norms: MQA/GQA attention with partial (first-half,
interleaved-pair) rotary and a fused-swiglu MLP — all inherited from
``Glm4Model``.  What differs is packaging:

  * config fields use legacy names (``num_layers``, ``padded_vocab_size``,
    ``multi_query_group_num``, ``ffn_hidden_size``, ``kv_channels``,
    ``layernorm_epsilon``, ``seq_length``, ``add_qkv_bias``, ``rope_ratio``)
    — normalized in ``ModelConfig.from_hf_config``;
  * weights live under ``transformer.encoder.layers.N.`` with a FUSED
    ``self_attention.query_key_value`` (weight + bias), ``dense`` for the
    o-proj, ``mlp.dense_h_to_4h`` (fused gate|up) / ``dense_4h_to_h``, and
    ``transformer.output_layer`` as the lm_head.
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from ..config import ModelConfig
from .glm4 import Glm4Model


class ChatGLMModel(Glm4Model):

    sandwich_norms = False

    def make_assign_plan(self):
        cfg = self.config
        D = cfg.head_dim
        nh, nkv = cfg.num_attention_heads, cfg.num_key_value_heads
        I = cfg.intermediate_size
        q_end, k_end = nh * D, nh * D + nkv * D

        def T(x):
            return np.ascontiguousarray(np.swapaxes(x, -1, -2))

        ident = lambda x: x  # noqa: E731
        plan: Dict[str, object] = {
            'transformer.embedding.word_embeddings.weight':
                (('embed',), ident, None),
            'transformer.encoder.final_layernorm.weight':
                (('final_norm',), ident, None),
        }
        if not cfg.tie_word_embeddings:
            plan['transformer.output_layer.weight'] = (('lm_head',), T, None)
        for l in range(cfg.num_layers):
            p = f'transformer.encoder.layers.{l}.'
            plan[p + 'input_layernorm.weight'] = \
                (('layers', 'attn_norm', l), ident, None)
            plan[p + 'post_attention_layernorm.weight'] = \
                (('layers', 'mlp_norm', l), ident, None)
            plan[p + 'self_attention.query_key_value.weight'] = [
                (('layers', 'wq', l), lambda x: T(x[:q_end]), None),
                (('layers', 'wk', l), lambda x: T(x[q_end:k_end]), None),
                (('layers', 'wv', l), lambda x: T(x[k_end:]), None),
            ]
            if cfg.attention_bias:
                plan[p + 'self_attention.query_key_value.bias'] = [
                    (('layers', 'bq', l), lambda x: x[:q_end], None),
                    (('layers', 'bk', l), lambda x: x[q_end:k_end], None),
                    (('layers', 'bv', l), lambda x: x[k_end:], None),
                ]
            plan[p + 'self_attention.dense.weight'] = \
                (('layers', 'wo', l), T, None)
            plan[p + 'mlp.dense_h_to_4h.weight'] = [
                (('layers', 'w_gate', l), lambda x: T(x[:I]), None),
                (('layers', 'w_up', l), lambda x: T(x[I:]), None),
            ]
            plan[p + 'mlp.dense_4h_to_h.weight'] = \
                (('layers', 'w_down', l), T, None)
        return plan
