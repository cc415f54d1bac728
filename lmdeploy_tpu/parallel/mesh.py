"""Device mesh construction and per-layer-type sharding rules.

Reference analog: ``lmdeploy/pytorch/distributed.py`` (per-layer-type TP process groups)
and TurboMind's EngineParam-driven sharding (``src/turbomind/models/llama/llama_params.h``).
On TPU the entire concept collapses into: one ``jax.sharding.Mesh`` with named axes
``('dp', 'tp')`` (later 'ep'/'cp'), plus PartitionSpec tables per layer type.  XLA's
GSPMD inserts all collectives (psum after row-parallel matmuls, all-gathers at layout
changes) and overlaps them with compute — the hand-written NCCL/cuda-ipc layer
(``src/turbomind/comm/``) has no analog here by design.

TP sharding rules (megatron-style column/row split):
  * wq/wk/wv, w_gate/w_up: column-parallel — PartitionSpec(None, None, 'tp')
  * wo, w_down:            row-parallel    — PartitionSpec(None, 'tp', None)
  * KV cache:              head-sharded    — (None layers, None blocks, None, 'tp', None)
  * lm_head:               vocab-sharded   — (None, 'tp'); sampling reduces over shards
  * norms/embed:           replicated
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def build_mesh(dp: int = 1, tp: int = 1, ep: int = 1, cp: int = 1,
               devices=None):
    """Mesh axes ('dp', 'ep', 'cp', 'tp') — tp innermost (tightest-coupled
    collectives on the shortest ICI hops), then cp (per-block KV stripes +
    partial-softmax reductions), then ep, then dp."""
    import jax
    from jax.sharding import Mesh

    if devices is None:
        devices = jax.devices()
    n = dp * tp * ep * cp
    assert len(devices) >= n, f'need {n} devices, have {len(devices)}'
    arr = np.array(devices[:n]).reshape(dp, ep, cp, tp)
    return Mesh(arr, axis_names=('dp', 'ep', 'cp', 'tp'))


def make_llama_shardings(model, shard_vocab: bool = True) -> Dict:
    """PartitionSpec tree matching LlamaModel.param_shapes().

    Quantized linears shard every member leaf (packed/scales/zeros or w8/scale)
    the same way as the dense weight would be: column-parallel on the output dim,
    row-parallel on the (packed) input dim.
    """
    from jax.sharding import PartitionSpec as P

    if hasattr(model, 'make_shardings'):   # model-specific layout (e.g. MLA)
        return model.make_shardings(shard_vocab=shard_vocab)

    col = P(None, None, 'tp')     # [L, in, out] shard out
    row = P(None, 'tp', None)     # [L, in, out] shard in
    rep1 = P(None, None)          # [L, dim]
    vec_col = P(None, 'tp')       # [L, out] bias of column-parallel

    def linear_spec(kind):
        shape = model.param_shapes()['layers']
        base = col if kind == 'col' else row
        if model.quant_method == 'w4a16':
            if kind == 'col':
                return {'packed': col, 'scales': col, 'zeros': col}
            return {'packed': row, 'scales': row, 'zeros': row}
        if model.quant_method in ('w8a8', 'fp8'):
            if kind == 'col':
                return {'w8': col, 'scale': vec_col}
            return {'w8': row, 'scale': P(None, None)}
        if model.quant_method == 'fp8_blocked':
            # bscale [L, Kb, Nb] mirrors the weight's [L, K, N] block grid
            if kind == 'col':
                return {'w8': col, 'bscale': col}
            return {'w8': row, 'bscale': row}
        return base

    layer_shapes = model.param_shapes()['layers']
    layers = {
        'attn_norm': rep1,
        'wq': linear_spec('col'), 'wk': linear_spec('col'), 'wv': linear_spec('col'),
        'wo': linear_spec('row'),
        'mlp_norm': rep1,
    }
    if 'w_gate' in layer_shapes:      # dense mlp
        layers.update(w_gate=linear_spec('col'), w_up=linear_spec('col'),
                      w_down=linear_spec('row'))
    if 'router' in layer_shapes:      # sparse MoE: [L,E,H,I] — experts over 'ep',
        # expert-internal dims over 'tp' (reference: moe_tp + ep groups)
        def espec(name, spec):
            # quantized expert stacks ({'w8','gscale'} / {'nib','scale'})
            # shard every member leaf like the dense stack would be
            shape = layer_shapes[name]
            if isinstance(shape, dict):
                return {k: spec for k in shape}
            return spec
        layers.update(router=P(None, None, None),
                      we_gate=espec('we_gate', P(None, 'ep', None, 'tp')),
                      we_up=espec('we_up', P(None, 'ep', None, 'tp')),
                      we_down=espec('we_down', P(None, 'ep', 'tp', None)))
    cfg = model.config
    if cfg.attention_bias:
        layers.update(bq=vec_col, bk=vec_col, bv=vec_col)
    if cfg.qk_norm:
        layers.update(q_norm=rep1, k_norm=rep1)
    shardings = {
        'embed': P(None, None),
        'layers': layers,
        'final_norm': P(None),
    }
    if not cfg.tie_word_embeddings:
        shardings['lm_head'] = P(None, 'tp') if shard_vocab else P(None, None)
    return shardings


def cache_sharding(num_kv_heads: int = 0, cp: int = 1):
    """[L, num_blocks, 2, block_size, HDp] unified pages — shard the
    head-major plane lanes over tp (head-aligned for tp dividing Hkv) and,
    with context parallelism, stripe each block's token slots over 'cp'
    (reference: cp_utils.h KV striping; the attention reference path's
    softmax reductions over the sharded slot dim become GSPMD partial-(M,L)
    collectives).

    A single-kv-head cache (MQA / MLA latent) cannot split its head axis, so
    it stays replicated across 'tp'.
    """
    from jax.sharding import PartitionSpec as P
    slot = 'cp' if cp > 1 else None
    if num_kv_heads == 1:
        return P(None, None, None, slot, None)
    return P(None, None, None, slot, 'tp')


def data_sharding(batch_axes: int = 2):
    """Batch inputs sharded over dp on the leading axis."""
    from jax.sharding import PartitionSpec as P
    return P(*(['dp'] + [None] * (batch_axes - 1)))
