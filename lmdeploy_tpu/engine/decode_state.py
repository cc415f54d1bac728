"""Device-resident decode state for multi-step decode runs.

Reference analog: the reference hides host latency with a prefetch pipeline
(``engine_loop.py:444`` schedules step N+1 while the GPU runs N) and CUDA-graph
replay (``graph_runner.py``).  The TPU equivalent implemented here goes further:
ALL per-step decode inputs (last token, position, block table, sampling params,
seen-token counts) live in device arrays, the decode step feeds sampled tokens
back into the state on device, and the engine dispatches a ``lax.scan`` of k
steps ("decode run") fetching one [k, B] token array per run — so the
host<->device round-trip (expensive over the TPU tunnel) is paid once per k
tokens instead of once per token.

The host only touches the state when batch membership changes (request joins /
finishes) or a row needs a new cache block — both via a batched `insert_rows`
scatter on donated buffers.
"""
from __future__ import annotations

from dataclasses import dataclass, fields
from typing import Any, Dict, List

import numpy as np


@dataclass
class DecodeState:
    """All leaves [Bmax, ...] on device; donated through every update."""

    token: Any          # [Bmax] i32 — last sampled token per row
    position: Any       # [Bmax] i32 — tokens in cache for this row (kv len)
    tables: Any         # [Bmax, W] i32
    active: Any         # [Bmax] bool
    step_no: Any        # [Bmax] i32 — per-row sampling step (seed folding)
    temperature: Any    # [Bmax] f32
    top_k: Any          # [Bmax] i32
    top_p: Any          # [Bmax] f32
    min_p: Any          # [Bmax] f32
    repetition_penalty: Any   # [Bmax] f32
    frequency_penalty: Any    # [Bmax] f32
    presence_penalty: Any     # [Bmax] f32
    do_sample: Any      # [Bmax] bool
    seed: Any           # [Bmax] u32
    adapter_id: Any     # [Bmax] i32 — S-LoRA slot (0 = none)
    pos_delta: Any      # [Bmax] i32 — mrope rope-position offset (qwen2-vl; 0 = none)
    token_counts: Any   # [Bmax+1, V] i16 — generated-token counts (freq/presence)
    prompt_mask: Any    # [Bmax+1, V] bool — tokens present in the prompt (repetition)


def register():
    import jax
    jax.tree_util.register_dataclass(
        DecodeState,
        data_fields=[f.name for f in fields(DecodeState)],
        meta_fields=[])


register()


def make_initial_state(max_batch: int, table_width: int, vocab_size: int):
    import jax.numpy as jnp
    z = lambda dt: jnp.zeros((max_batch,), dt)  # noqa: E731
    return DecodeState(
        token=z(jnp.int32), position=z(jnp.int32),
        tables=jnp.zeros((max_batch, table_width), jnp.int32),
        active=z(jnp.bool_), step_no=z(jnp.int32),
        temperature=jnp.ones((max_batch,), jnp.float32),
        top_k=z(jnp.int32), top_p=jnp.ones((max_batch,), jnp.float32),
        min_p=z(jnp.float32),
        repetition_penalty=jnp.ones((max_batch,), jnp.float32),
        frequency_penalty=z(jnp.float32), presence_penalty=z(jnp.float32),
        do_sample=z(jnp.bool_), seed=z(jnp.uint32), adapter_id=z(jnp.int32),
        pos_delta=z(jnp.int32),
        token_counts=jnp.zeros((max_batch, vocab_size), jnp.int16),
        prompt_mask=jnp.zeros((max_batch, vocab_size), jnp.bool_),
    )


def host_rows_from_seqs(seqs: List, table_width: int) -> Dict[str, np.ndarray]:
    """Compose per-row host arrays for inserting these seqs into the state.

    Each seq must be RUNNING: last history token sampled, position =
    num_computed_tokens.  token_counts rows are NOT rebuilt here — prefill
    already maintained them on device at the same row index.
    """
    n = len(seqs)
    out = {
        'token': np.zeros(n, np.int32),
        'position': np.zeros(n, np.int32),
        'tables': np.zeros((n, table_width), np.int32),
        'active': np.ones(n, bool),
        'step_no': np.zeros(n, np.int32),
        'temperature': np.ones(n, np.float32),
        'top_k': np.zeros(n, np.int32),
        'top_p': np.ones(n, np.float32),
        'min_p': np.zeros(n, np.float32),
        'repetition_penalty': np.ones(n, np.float32),
        'frequency_penalty': np.zeros(n, np.float32),
        'presence_penalty': np.zeros(n, np.float32),
        'do_sample': np.zeros(n, bool),
        'seed': np.zeros(n, np.uint32),
        'adapter_id': np.zeros(n, np.int32),
        'pos_delta': np.zeros(n, np.int32),
    }
    for i, seq in enumerate(seqs):
        p = seq.sampling_params
        out['token'][i] = seq.history_ids[-1]
        out['position'][i] = seq.num_computed_tokens
        nb = min(len(seq.logical_blocks), table_width)
        out['tables'][i, :nb] = seq.logical_blocks[:nb]
        out['step_no'][i] = seq.num_output_tokens
        out['temperature'][i] = p.temperature
        out['top_k'][i] = p.top_k
        out['top_p'][i] = p.top_p
        out['min_p'][i] = p.min_p
        out['repetition_penalty'][i] = p.repetition_penalty
        out['frequency_penalty'][i] = p.frequency_penalty
        out['presence_penalty'][i] = p.presence_penalty
        out['do_sample'][i] = p.do_sample
        out['seed'][i] = np.uint32(p.random_seed or 0)
        out['adapter_id'][i] = getattr(seq, 'adapter_slot', 0)
        out['pos_delta'][i] = getattr(seq, 'mrope_delta', 0)
    return out
