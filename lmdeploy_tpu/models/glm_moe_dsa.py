"""GLM-5.2 (glm_moe_dsa): MLA + DeepSeek-MoE with shared DSA sparse attention.

Reference analog: ``lmdeploy/pytorch/models/glm_moe_dsa.py`` (+
``glm_moe_dsa_mtp.py``).  Architecturally a DeepSeek-V3.2 variant — absorbed
MLA attention, lightning-indexer top-k sparse selection, DeepSeek-style MoE —
with two GLM twists:

  * **per-layer indexer types** (``config.indexer_types``): 'full' layers run
    their own lightning indexer; 'shared' layers have NO indexer weights and
    REUSE the top-k indices computed by the most recent full layer (reference
    ``DSATopKIndicesBuffer``).  Here the indices ride the layer-scan carry
    (``_init_dsa_carry``), and a per-layer constant flag selects compute vs
    reuse under ``lax.cond`` — the shared layers skip the whole scoring
    einsum at runtime.
  * **non-interleaved indexer rope** by default
    (``config.indexer_rope_interleave`` = False): GLM checkpoints store the
    indexer's rope dims in the standard rotate-half layout, unlike DeepSeek's
    interleaved convention (reference ``GlmMoeDsaIndexer._apply_rotary_pos_emb``).

The main MLA attention path is identical to DeepSeek-V3.2 (the reference
shares ``DeepseekV32Attention.forward``), so everything else — inline indexer
key caching, absorbed attention over gathered latents, MoE routing — comes
from ``deepseek_v32.py`` / ``deepseek.py`` unchanged.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..nn.layers import apply_rope
from .deepseek import DeepseekMTP
from .deepseek_v32 import DeepseekV32Model


class GlmMoeDsaModel(DeepseekV32Model):

    def __init__(self, config: ModelConfig):
        hf = config.hf_config or {}
        super().__init__(config)
        types = hf.get('indexer_types')
        L = config.num_layers
        if types is None:
            types = ['full'] * L
        # layers past the list (e.g. the MTP layer) default to 'full'
        # (reference _get_layer_indexer_type)
        self.idx_full = tuple(
            (types[i] if i < len(types) else 'full') == 'full'
            for i in range(L))
        assert self.idx_full[0], 'layer 0 must compute its own DSA indices'
        self.idx_rope_interleave = bool(hf.get('indexer_rope_interleave',
                                               False))

    # -- indexer rope: standard rotate-half unless the config interleaves -----
    def _indexer_rope_q(self, iq_pe, cos, sin):
        if self.idx_rope_interleave:
            return super()._indexer_rope_q(iq_pe, cos, sin)
        return apply_rope(iq_pe, iq_pe, cos, sin)[0]

    def _indexer_rope_k(self, ik_pe, cos, sin):
        if self.idx_rope_interleave:
            return super()._indexer_rope_k(ik_pe, cos, sin)
        d = ik_pe[:, :, None, :]
        return apply_rope(d, d, cos, sin)[0]

    # -- shared-index carry ----------------------------------------------------
    def _init_dsa_carry(self, B, T, meta, block_size):
        S = meta.block_tables.shape[1] * block_size
        K = min(self.idx_topk, S)
        return (jnp.zeros((B, T, K), jnp.int32), jnp.zeros((B, T, K), bool))

    def _dsa_select(self, x, qr, w, cos, sin, hist_k, causal, layer, extra):
        full = jnp.asarray(np.asarray(self.idx_full, bool))[
            jnp.clip(layer, 0, len(self.idx_full) - 1)]

        def compute(_):
            idx, valid, _e = super(GlmMoeDsaModel, self)._dsa_select(
                x, qr, w, cos, sin, hist_k, causal, layer, extra)
            return idx, valid

        def reuse(_):
            return extra

        idx, valid = jax.lax.cond(full, compute, reuse, None)
        return idx, valid, (idx, valid)


class GlmMoeDsaMTP(DeepseekMTP, GlmMoeDsaModel):
    """GLM-5.2 MTP proposer: enorm/hnorm/eh_proj + ONE DSA decoder layer.

    Reference: ``lmdeploy/pytorch/models/glm_moe_dsa_mtp.py`` — identical
    composition to DeepSeek-V3 MTP but the block is a DSA layer (its layer
    index is past ``indexer_types``, so it always computes its own indices).
    MRO: DeepseekMTP provides the proposer structure (param tree, ``step``);
    GlmMoeDsaModel provides the DSA ``_attn_block``.
    """

    def make_assign_plan(self):
        plan = super().make_assign_plan()   # DeepseekMTP's MLA/MoE entries
        cfg = self.config

        def T(x):
            return np.ascontiguousarray(np.swapaxes(x, -1, -2))

        ident = lambda x: x  # noqa: E731
        p = f'model.layers.{self.mtp_index}.self_attn.indexer.'
        plan[p + 'wq_b.weight'] = (('layer', 'idx_wq_b', 0), T, None)
        plan[p + 'wk.weight'] = (('layer', 'idx_wk', 0), T, None)
        plan[p + 'k_norm.weight'] = (('layer', 'idx_k_norm', 0), ident, None)
        plan[p + 'k_norm.bias'] = (('layer', 'idx_k_norm_b', 0), ident, None)
        plan[p + 'weights_proj.weight'] = (('layer', 'idx_weights', 0), T,
                                           None)
        return plan
