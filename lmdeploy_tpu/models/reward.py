"""Reward models: a scalar score head over the shared decoder.

Reference analog: ``lmdeploy/pytorch/models/qwen2_reward.py`` (two-layer ReLU
score head) and ``internlm2_reward.py`` (v_head), served through
``async_get_reward_score`` — the model's "logits" ARE the per-position scores
([T, 1]); the serving layer takes the last position.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from .internlm2 import InternLM2Model
from .llama import LlamaModel


class Qwen2RewardModel(LlamaModel):
    """Qwen2 decoder + score head (Linear-ReLU-Linear -> 1)."""

    is_reward_model = True

    def __init__(self, config: ModelConfig):
        config.attention_bias = True
        super().__init__(config)

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        shapes.pop('lm_head', None)
        H = self.config.hidden_size
        shapes.update(score_w1=(H, H), score_b1=(H,),
                      score_w2=(H, 1), score_b2=(1,))
        return shapes

    def make_assign_plan(self):
        plan = super().make_assign_plan()
        plan.pop('lm_head.weight', None)

        def T(x):
            return np.ascontiguousarray(np.swapaxes(x, -1, -2))

        ident = lambda x: x  # noqa: E731
        plan.update({
            'score.0.weight': (('score_w1',), T, None),
            'score.0.bias': (('score_b1',), ident, None),
            'score.2.weight': (('score_w2',), T, None),
            'score.2.bias': (('score_b2',), ident, None),
        })
        return plan

    def _head(self, params, x):
        h = jnp.dot(x, params['score_w1'],
                    preferred_element_type=jnp.float32) + params['score_b1']
        h = jax.nn.relu(h)
        return (jnp.dot(h.astype(x.dtype), params['score_w2'],
                        preferred_element_type=jnp.float32)
                + params['score_b2'])


class InternLM2RewardModel(InternLM2Model):
    """InternLM2 decoder + single v_head projection."""

    is_reward_model = True

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        shapes.pop('lm_head', None)
        shapes['v_head'] = (self.config.hidden_size, 1)
        return shapes

    def make_assign_plan(self):
        plan = super().make_assign_plan()
        plan.pop('output.weight', None)
        plan.pop('lm_head.weight', None)

        def T(x):
            return np.ascontiguousarray(np.swapaxes(x, -1, -2))

        plan['v_head.weight'] = (('v_head',), T, None)
        return plan

    def _head(self, params, x):
        return jnp.dot(x, params['v_head'],
                       preferred_element_type=jnp.float32)
