"""GLM-4 (0414) dense family.

Reference analog: ``lmdeploy/pytorch/models/glm4.py``: llama-family compute
with three deviations, all handled here:
  * partial rotary — rope covers ``head_dim * partial_rotary_factor`` dims
    (tables built for ``config.rope_dim``), applied to the FIRST half of each
    head in *interleaved* pair order (``_extract_rope`` in the reference:
    de-interleave, rotate-half, re-interleave);
  * sandwich norms — ``post_self_attn_layernorm`` / ``post_mlp_layernorm``
    normalize the block output before its residual add (LlamaModel
    'post_attn_norm'/'post_mlp_norm' hooks);
  * fused ``gate_up_proj`` checkpoint tensor.
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from ..nn.layers import apply_rope
from .llama import LlamaModel


def _deinterleave(x):
    """[..., d] interleaved pair layout -> half-split rotate-half layout."""
    *lead, d = x.shape
    return x.reshape(*lead, d // 2, 2).swapaxes(-1, -2).reshape(*lead, d)


def _interleave(x):
    *lead, d = x.shape
    return x.reshape(*lead, 2, d // 2).swapaxes(-1, -2).reshape(*lead, d)


class Glm4Model(LlamaModel):

    sandwich_norms = True

    def _apply_rope(self, q, k, cos, sin, w=None):
        r = self.config.rope_dim
        q_rot = _deinterleave(q[..., :r])
        k_rot = _deinterleave(k[..., :r])
        q_rot, k_rot = apply_rope(q_rot, k_rot, cos, sin)
        q = jnp.concatenate([_interleave(q_rot), q[..., r:]], axis=-1)
        k = jnp.concatenate([_interleave(k_rot), k[..., r:]], axis=-1)
        return q, k

    def make_assign_plan(self):
        cfg = self.config
        I = cfg.intermediate_size

        def T(x):
            return np.ascontiguousarray(np.swapaxes(x, -1, -2))

        def split_gate(x):
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
            if self.sandwich_norms:
                plan[p + 'post_self_attn_layernorm.weight'] = \
                    (('layers', 'post_attn_norm', l), ident, None)
                plan[p + 'post_mlp_layernorm.weight'] = \
                    (('layers', 'post_mlp_norm', l), ident, None)
            for hf, name in (('q_proj', 'wq'), ('k_proj', 'wk'),
                             ('v_proj', 'wv'), ('o_proj', 'wo')):
                plan[p + f'self_attn.{hf}.weight'] = \
                    (('layers', name, l), T, None)
                if cfg.attention_bias and hf != 'o_proj':
                    plan[p + f'self_attn.{hf}.bias'] = \
                        (('layers', 'b' + hf[0], l), ident, None)
            plan[p + 'mlp.gate_up_proj.weight'] = [
                (('layers', 'w_gate', l), split_gate, None),
                (('layers', 'w_up', l), split_up, None),
            ]
            plan[p + 'mlp.down_proj.weight'] = (('layers', 'w_down', l), T, None)
        return plan
