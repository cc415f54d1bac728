"""Mixtral / Qwen2-MoE style sparse-MoE models.

Reference analog: ``lmdeploy/pytorch/models/mixtral.py`` + ``nn/moe/`` (router,
expert dispatch) and TurboMind's MoeFfnLayer (``moe_ffn_layer.h:16``).

TPU-first MoE strategy for this round: dense-combine via all-expert einsums.
Every expert computes on every token; top-k routing weights (folded into the
activations) zero out the non-selected contributions.  On the decode path this
is close to optimal: with continuous batching the union of selected experts
covers most experts anyway, and the op is weight-bandwidth-bound — all expert
weights stream from HBM regardless.  Prefill wastes (E/k)x FLOPs; the
grouped-matmul (megablocks-style) kernel replaces this in a later round, behind
the same ``_mlp`` interface.

Expert parallelism is GSPMD-native: the expert stacks are sharded over the
'ep' mesh axis (parallel/mesh.py) and the down-proj einsum contracts the full
expert axis, so each shard computes only its resident experts and XLA inserts
the cross-'ep' reduce — the expert-parallel combine — automatically.  Token
chunking bounds the [Nc, E, Ie] activation for long prefills.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from .llama import LlamaModel


class MixtralModel(LlamaModel):
    """Sparse-MoE decoder; attention identical to llama."""

    def _mlp_shapes(self, L: int, H: int, I: int) -> Dict[str, Any]:
        cfg = self.config
        E = cfg.num_experts
        Ie = cfg.moe_intermediate_size or I
        if self.quant_method == 'w4a16':
            # W4A16 expert stacks stay PACKED in HBM (4x residency saving —
            # the reason to quantize MoE: fitting more/larger experts) and
            # the selected layer's experts dequantize on the fly in _mlp.
            import jax as _jax
            gs = self.group_size

            def q4(K, N):
                return {'packed': _jax.ShapeDtypeStruct((L, E, K // 8, N),
                                                        jnp.int32),
                        'scales': _jax.ShapeDtypeStruct((L, E, K // gs, N),
                                                        jnp.float32),
                        'zeros': _jax.ShapeDtypeStruct((L, E, K // gs, N),
                                                       jnp.float32)}
            return {'router': (L, H, E), 'we_gate': q4(H, Ie),
                    'we_up': q4(H, Ie), 'we_down': q4(Ie, H)}
        return {
            'router': (L, H, E),
            'we_gate': (L, E, H, Ie),
            'we_up': (L, E, H, Ie),
            'we_down': (L, E, Ie, H),
        }

    @staticmethod
    def _expert_weights(w, name, dtype):
        """Dense [E, K, N] expert stack; dequantizes W4A16 leaves on the fly
        (vmapped plane-unpack over E; one transient bf16 stack per layer)."""
        leaf = w[name]
        if not isinstance(leaf, dict) or 'packed' not in leaf:
            return leaf
        from ..ops.pallas.quant_matmul import dequant_w4
        K8 = leaf['packed'].shape[-2]
        gs = K8 * 8 // leaf['scales'].shape[-2]
        return jax.vmap(lambda p, s, z: dequant_w4(p, s, z, gs, dtype))(
            leaf['packed'], leaf['scales'], leaf['zeros'])

    def _mlp(self, w, x: jax.Array) -> jax.Array:
        from ..ops.moe import eplb_remap, moe_ffn
        cfg = self.config
        k = cfg.num_experts_per_tok
        B, T, H = x.shape
        xf = x.reshape(B * T, H)
        if isinstance(w.get('we_gate'), dict):
            w = dict(w,
                     we_gate=self._expert_weights(w, 'we_gate', x.dtype),
                     we_up=self._expert_weights(w, 'we_up', x.dtype),
                     we_down=self._expert_weights(w, 'we_down', x.dtype))

        logits = jnp.dot(xf, w['router'],
                         preferred_element_type=jnp.float32)        # [N, E]
        if cfg.norm_topk_prob:
            top_vals, top_idx = jax.lax.top_k(logits, k)
            top_w = jax.nn.softmax(top_vals, axis=-1)               # renormalized
        else:
            probs = jax.nn.softmax(logits, axis=-1)
            top_w, top_idx = jax.lax.top_k(probs, k)

        top_idx = eplb_remap(w, top_idx)
        out = moe_ffn(xf, top_idx, top_w, w['we_gate'], w['we_up'],
                      w['we_down'], x.dtype,
                      allow_ragged=not getattr(self, 'ep_sharded', False),
                      ep_mesh=getattr(self, 'ep_mesh', None))
        return out.reshape(B, T, H).astype(x.dtype)

    def make_assign_plan(self):
        plan = super().make_assign_plan()
        cfg = self.config
        # drop the dense-mlp entries inherited from the base class
        for l in range(cfg.num_layers):
            for mod in ('mlp.gate_proj', 'mlp.up_proj', 'mlp.down_proj'):
                for part in ('weight', 'qweight', 'qzeros', 'scales'):
                    plan.pop(f'model.layers.{l}.{mod}.{part}', None)

        def T(x):
            return np.ascontiguousarray(np.swapaxes(x, -1, -2))

        if self.quant_method == 'w4a16':
            from ..lite import formats
            fmt = (cfg.quantization_config or {}).get('quant_method', 'awq')
            unpack_w = (formats.gptq_qweight_to_kernel if fmt == 'gptq'
                        else formats.awq_qweight_to_kernel)
            unpack_z = (formats.unpack_gptq_qzeros if fmt == 'gptq'
                        else formats.unpack_awq_qzeros)
            for l in range(cfg.num_layers):
                p = f'model.layers.{l}.'
                plan[p + 'block_sparse_moe.gate.weight'] = \
                    (('layers', 'router', l), T, None)
                for e in range(cfg.num_experts):
                    for prefix, leaf in ((f'block_sparse_moe.experts.{e}.w1',
                                          'we_gate'),
                                         (f'block_sparse_moe.experts.{e}.w3',
                                          'we_up'),
                                         (f'block_sparse_moe.experts.{e}.w2',
                                          'we_down')):
                        q = p + prefix
                        plan[q + '.qweight'] = (
                            ('layers', leaf, 'packed', l), unpack_w,
                            _ExpertSlice(e))
                        plan[q + '.scales'] = (
                            ('layers', leaf, 'scales', l),
                            lambda x: x.astype('float32'), _ExpertSlice(e))
                        plan[q + '.qzeros'] = (
                            ('layers', leaf, 'zeros', l), unpack_z,
                            _ExpertSlice(e))
            return plan

        for l in range(cfg.num_layers):
            p = f'model.layers.{l}.'
            plan[p + 'block_sparse_moe.gate.weight'] = \
                (('layers', 'router', l), T, None)
            # mixtral expert naming: block_sparse_moe.experts.{e}.w1/w3/w2
            for e in range(cfg.num_experts):
                q = p + f'block_sparse_moe.experts.{e}.'
                plan[q + 'w1.weight'] = (('layers', 'we_gate', l),
                                         T, _ExpertSlice(e))
                plan[q + 'w3.weight'] = (('layers', 'we_up', l), T, _ExpertSlice(e))
                plan[q + 'w2.weight'] = (('layers', 'we_down', l), T, _ExpertSlice(e))
            # qwen2-moe style naming
            plan[p + 'mlp.gate.weight'] = (('layers', 'router', l), T, None)
            for e in range(cfg.num_experts):
                q = p + f'mlp.experts.{e}.'
                plan[q + 'gate_proj.weight'] = (('layers', 'we_gate', l), T,
                                                _ExpertSlice(e))
                plan[q + 'up_proj.weight'] = (('layers', 'we_up', l), T,
                                              _ExpertSlice(e))
                plan[q + 'down_proj.weight'] = (('layers', 'we_down', l), T,
                                                _ExpertSlice(e))
        return plan


class _ExpertSlice:
    """Marks an assign-plan column as an expert index (first axis after layer)."""

    def __init__(self, e: int):
        self.e = e
