"""Baichuan / Baichuan2 (7B-geometry, rope) — llama with a fused W_pack.

Reference analog: ``lmdeploy/pytorch/models/baichuan.py``.  The 13B variants
use ALiBi positional bias instead of rope and are not supported yet.
"""
from __future__ import annotations

import numpy as np

from ..config import ModelConfig
from .llama import LlamaModel


class BaichuanModel(LlamaModel):

    def make_assign_plan(self):
        cfg = self.config
        plan = super().make_assign_plan()
        H = cfg.hidden_size
        q_out, kv_out = self.q_out, self.kv_out

        def T(x):
            return np.ascontiguousarray(np.swapaxes(x, -1, -2))

        for l in range(cfg.num_layers):
            for mod, name in (('q_proj', 'wq'), ('k_proj', 'wk'),
                              ('v_proj', 'wv')):
                plan.pop(f'model.layers.{l}.self_attn.{mod}.weight', None)
            # W_pack rows: [q | k | v]
            plan[f'model.layers.{l}.self_attn.W_pack.weight'] = [
                (('layers', 'wq', l), lambda x: T(x[:q_out]), None),
                (('layers', 'wk', l),
                 lambda x: T(x[q_out:q_out + kv_out]), None),
                (('layers', 'wv', l),
                 lambda x: T(x[q_out + kv_out:]), None),
            ]
        return plan


class InternLMv1Model(LlamaModel):
    """InternLM v1: llama geometry with bias on ALL attention projections.

    Reference analog: ``lmdeploy/pytorch/models/internlm.py``.
    """

    def __init__(self, config: ModelConfig):
        config.attention_bias = bool((config.hf_config or {}).get('bias', True))
        super().__init__(config)

    def param_shapes(self):
        shapes = super().param_shapes()
        if self.config.attention_bias:
            shapes['layers']['bo'] = (self.config.num_layers,
                                      self.config.hidden_size)
        return shapes

    def make_assign_plan(self):
        plan = super().make_assign_plan()
        if self.config.attention_bias:
            ident = lambda x: x  # noqa: E731
            for l in range(self.config.num_layers):
                plan[f'model.layers.{l}.self_attn.o_proj.bias'] = \
                    (('layers', 'bo', l), ident, None)
        return plan
