"""Prefill/decode disaggregation: KV-block migration between engines.

Reference analog: ``lmdeploy/pytorch/disagg/`` (EngineRole Hybrid/Prefill/Decode,
MigrationBackend DLSlime/Mooncake/InfiniStore RDMA, conn/protocol.py block
migration).  TPU equivalent: KV blocks move over DCN as plain tensors — a prefill
engine exports a finished session's cache blocks + token state, a decode engine
imports them into freshly allocated blocks and continues decoding with no
recompute.  The wire format is a dict of numpy arrays (npz over HTTP via the
/distserve endpoints in serve/api_server.py).

The cache layout makes this cheap on both sides: blocks are contiguous slices
of the unified pages ``[L, NB, 2, BS, HDp]``, so export is one gather and
import one scatter per pytree leaf — quantized caches (QuantKV int8 /
QuantKV4 int4) migrate the same way, their scale planes riding along as
additional leaves.
"""
from __future__ import annotations

import io
from typing import Dict, Optional

import numpy as np

from .paging.seq import MessageStatus, SamplingParams


def export_session_kv(engine, session_id: int) -> Dict[str, np.ndarray]:
    """Export a session's KV blocks + sequence state (prefill side).

    The sequence must still hold its blocks (engine role 'prefill' retains
    finished sequences until exported).
    """
    import jax.numpy as jnp

    session = engine.scheduler.seq_manager.get_session(session_id)
    assert session is not None and session.sequences, \
        f'session {session_id} not found or empty'
    seq = next(iter(session.sequences.values()))
    assert seq.logical_blocks, 'sequence holds no KV blocks (already released?)'

    import jax
    agent = engine.model_agent
    cache = agent.cache_engine.kv_cache
    has_state = getattr(agent.model, 'has_linear_state', False)
    pages = cache['pages'] if has_state else cache
    blocks = jnp.asarray(np.asarray(seq.logical_blocks, np.int32))
    leaves = jax.tree_util.tree_leaves(pages)
    out = {
        'token_ids': np.asarray(seq.history_ids, np.int32),
        'num_computed': np.asarray(seq.num_computed_tokens, np.int64),
        'block_size': np.asarray(engine.configs.cache.block_size, np.int64),
        'num_leaves': np.asarray(len(leaves), np.int64),
    }
    # every cache leaf (pages; int8/int4 scale planes) has blocks at dim 1
    for i, leaf in enumerate(leaves):
        out[f'kv_leaf_{i}'] = np.asarray(leaf[:, blocks])
    if has_state:
        # hybrid linear-attention: the recurrent/conv state rides along —
        # KV pages alone cannot resume a gated-DeltaNet sequence
        assert seq.batch_slot >= 0, 'exported sequence lost its batch slot'
        for k, v in agent.snapshot_slot_state(seq.batch_slot).items():
            out[f'state_{k}'] = v
    return out


def release_exported(engine, session_id: int):
    """Free the prefill-side session after a successful migration."""
    engine.end_session(session_id)


def import_session_kv(engine, session_id: int, payload: Dict[str, np.ndarray],
                      sampling_params: Optional[SamplingParams] = None):
    """Import migrated KV into this engine and register a RUNNING sequence.

    Returns the created sequence; call ``engine.continue_session`` to stream the
    remaining tokens.
    """
    import jax.numpy as jnp

    assert int(payload['block_size']) == engine.configs.cache.block_size, \
        'block_size mismatch between PD peers'
    token_ids = payload['token_ids'].tolist()
    num_computed = int(payload['num_computed'])
    n_blocks = payload['kv_leaf_0'].shape[1]

    engine.add_session(session_id)
    session = engine.scheduler.seq_manager.get_session(session_id)
    seq = session.add_sequence(token_ids, sampling_params or SamplingParams())
    bm = engine.scheduler.block_manager
    assert bm.can_allocate(n_blocks), 'decode engine out of KV blocks'
    seq.logical_blocks = bm.allocate(n_blocks)
    seq.num_computed_tokens = num_computed
    seq.status = MessageStatus.RUNNING

    agent = engine.model_agent
    import jax
    cache = agent.cache_engine.kv_cache
    has_state = getattr(agent.model, 'has_linear_state', False)
    pages = cache['pages'] if has_state else cache
    idx = jnp.asarray(np.asarray(seq.logical_blocks, np.int32))
    leaves, treedef = jax.tree_util.tree_flatten(pages)
    assert len(leaves) == int(payload['num_leaves']), 'quant_policy mismatch'
    new_leaves = [
        leaf.at[:, idx].set(jnp.asarray(payload[f'kv_leaf_{i}'], leaf.dtype))
        for i, leaf in enumerate(leaves)]
    new_pages = jax.tree_util.tree_unflatten(treedef, new_leaves)
    agent.cache_engine.swap_caches(
        {**cache, 'pages': new_pages} if has_state else new_pages)
    agent.insert_decode_rows([seq])
    if has_state:
        snap = {k[len('state_'):]: payload[k]
                for k in payload if k.startswith('state_')}
        assert snap, 'payload missing linear-attention state'
        agent._apply_ssm_restores([(seq.batch_slot, snap)])
    # fresh slot: clear the seen-token counts + prompt mask (skipped prefill)
    V = engine.configs.model.vocab_size
    agent._apply_insert(np.asarray([seq.batch_slot], np.int32),
                        {'token_counts': np.zeros((1, V), np.int16),
                         'prompt_mask': np.zeros((1, V), bool)})
    seq._synced_blocks = len(seq.logical_blocks)
    return seq


def serialize_payload(payload: Dict[str, np.ndarray]) -> bytes:
    buf = io.BytesIO()
    np.savez(buf, **payload)
    return buf.getvalue()


def deserialize_payload(data: bytes) -> Dict[str, np.ndarray]:
    buf = io.BytesIO(data)
    loaded = np.load(buf)
    return {k: loaded[k] for k in loaded.files}
