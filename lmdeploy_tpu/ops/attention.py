"""Paged attention over a block-table KV cache — jnp reference implementation.

Reference analog: the CUDA attention stack in ``src/turbomind/kernels/attention/`` (prefill
``attention.cu``, decode ``decoding.cu`` split-K flash decoding, paged block iteration
``block_iterator.h``) and the Triton kernels in ``lmdeploy/pytorch/kernels/cuda/
pagedattention.py`` / ``fill_kv_cache.py``.

Design notes (TPU-first):
  * One unified entry point serves prefill chunks, chunked-prefill continuation, and
    decode — decode is just a T=1 chunk with history.  Static shapes select the
    specialization; the engine buckets (B, T, table_width).
  * The cache is one array per layer ``[num_blocks, block_size, kv_heads, head_dim]``;
    "fill" is a flat scatter, "read" is a block-table gather.  The Pallas kernel
    (ops/pallas/) replaces the gather+softmax with a VMEM-resident flash loop; this file
    is the always-correct reference XLA path and the CPU test oracle.
  * GQA is computed without materializing repeated KV heads (einsum grouping).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = float('-inf')


def fill_kv_cache(k_cache: jax.Array, v_cache: jax.Array, k_new: jax.Array,
                  v_new: jax.Array, slot_mapping: jax.Array,
                  ) -> Tuple[jax.Array, jax.Array]:
    """Scatter new K/V rows into the paged cache.

    Args:
      k_cache/v_cache: [num_blocks, block_size, Hkv, D]
      k_new/v_new:     [num_tokens, Hkv, D]
      slot_mapping:    [num_tokens] flat slot = block_id * block_size + offset.
                       Padded tokens must map to slot 0 ... of the reserved padding
                       block (block 0), so scatters of padding are harmless.
    """
    nb, bs, h, d = k_cache.shape
    k_flat = k_cache.reshape(nb * bs, h, d)
    v_flat = v_cache.reshape(nb * bs, h, d)
    k_flat = k_flat.at[slot_mapping].set(k_new.astype(k_cache.dtype))
    v_flat = v_flat.at[slot_mapping].set(v_new.astype(v_cache.dtype))
    return k_flat.reshape(nb, bs, h, d), v_flat.reshape(nb, bs, h, d)


def paged_attention(
    q: jax.Array,                 # [B, T, Hq, D]
    k_cache: jax.Array,           # [num_blocks, block_size, Hkv, D]
    v_cache: jax.Array,           # [num_blocks, block_size, Hkv, D]
    block_tables: jax.Array,      # [B, W] physical block ids (padded with 0)
    history_lens: jax.Array,      # [B] tokens already in cache before this chunk
    q_lens: jax.Array,            # [B] valid query tokens in this chunk (<= T)
    scale: float,
    logit_softcap: Optional[float] = None,
    window_size: Optional[int] = None,
) -> jax.Array:
    """Attention of chunk queries against the paged cache (which already contains the
    chunk's own K/V — call fill_kv_cache first).

    Query i of row b has absolute position ``history_lens[b] + i`` and attends to all
    cache positions ``j <= pos`` (causal), optionally windowed.  Returns [B, T, Hq, D].
    """
    B, T, Hq, D = q.shape
    _, block_size, Hkv, _ = k_cache.shape
    W = block_tables.shape[1]
    S = W * block_size
    G = Hq // Hkv

    # gather KV: [B, W, bs, Hkv, D] -> [B, S, Hkv, D]
    k = k_cache[block_tables].reshape(B, S, Hkv, D)
    v = v_cache[block_tables].reshape(B, S, Hkv, D)

    qg = q.reshape(B, T, Hkv, G, D)
    scores = jnp.einsum('bthgd,bshd->bhgts', qg.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale            # [B,Hkv,G,T,S]
    if logit_softcap is not None and logit_softcap > 0:
        scores = jnp.tanh(scores / logit_softcap) * logit_softcap

    pos_q = history_lens[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]   # [B,T]
    pos_k = jnp.arange(S, dtype=jnp.int32)[None, :]                           # [1,S]
    mask = pos_k[:, None, :] <= pos_q[:, :, None]                             # [B,T,S]
    if window_size is not None and window_size > 0:
        mask &= pos_k[:, None, :] > (pos_q[:, :, None] - window_size)
    scores = jnp.where(mask[:, None, None, :, :], scores, NEG_INF)

    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum('bhgts,bshd->bthgd', probs, v.astype(jnp.float32))
    return out.reshape(B, T, Hq, D).astype(q.dtype)


def compute_slot_mapping(block_tables: jax.Array, history_lens: jax.Array,
                         q_lens: jax.Array, T: int, block_size: int) -> jax.Array:
    """Flat cache slots for each (row, chunk-position) token; padding -> slot of block 0.

    Returns [B*T] int32 suitable for fill_kv_cache with k_new reshaped to [B*T, H, D].
    """
    B = block_tables.shape[0]
    idx = jnp.arange(T, dtype=jnp.int32)[None, :]                  # [1,T]
    pos = history_lens[:, None] + idx                              # [B,T] absolute pos
    blk_idx = pos // block_size
    blk_off = pos % block_size
    blk_idx = jnp.clip(blk_idx, 0, block_tables.shape[1] - 1)
    phys = jnp.take_along_axis(block_tables, blk_idx, axis=1)      # [B,T]
    slots = phys * block_size + blk_off
    valid = idx < q_lens[:, None]
    # padding block 0, offset 0..bs-1 keeps scatters in-bounds and harmless
    slots = jnp.where(valid, slots, blk_off)
    return slots.reshape(B * T)
