"""Paged-attention jnp reference vs naive dense attention (unified layout)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmdeploy_tpu.ops.attention import (compute_slot_mapping, fill_kv_cache,
                                        kv_row_width, paged_attention,
                                        split_kv_planes)


def naive_attention(q, k, v, history_len, q_len, scale):
    """Dense causal attention for one sequence. q: [T,Hq,D], k/v: [S,Hkv,D]."""
    T, Hq, D = q.shape
    S, Hkv, _ = k.shape
    G = Hq // Hkv
    k = np.repeat(k, G, axis=1)   # [S,Hq,D]
    v = np.repeat(v, G, axis=1)
    out = np.zeros_like(q, dtype=np.float32)
    for t in range(q_len):
        pos = history_len + t
        for h in range(Hq):
            scores = (q[t, h].astype(np.float32) @
                      k[:pos + 1, h].astype(np.float32).T) * scale
            probs = np.exp(scores - scores.max())
            probs /= probs.sum()
            out[t, h] = probs @ v[:pos + 1, h].astype(np.float32)
    return out


def setup_cache(B, max_ctx, block_size, Hkv, D):
    num_blocks = B * (max_ctx // block_size) + 8
    _, rowp = kv_row_width(Hkv, D)
    kv_cache = jnp.zeros((1, num_blocks, 2, block_size, rowp), jnp.float32)
    W = max_ctx // block_size
    # assign disjoint blocks per row, skipping block 0
    tables = np.arange(1, 1 + B * W, dtype=np.int32).reshape(B, W)
    return kv_cache, jnp.asarray(tables)


@pytest.mark.parametrize('history,qlen', [(0, 12), (16, 8), (30, 1)])
def test_paged_matches_naive(history, qlen):
    rng = np.random.RandomState(0)
    B, T, Hq, Hkv, D = 2, 16, 4, 2, 8
    block_size = 16
    max_ctx = 64
    scale = D ** -0.5

    kv_cache, tables = setup_cache(B, max_ctx, block_size, Hkv, D)
    history_lens = jnp.full((B,), history, jnp.int32)
    q_lens = jnp.full((B,), qlen, jnp.int32)

    # place history KV into the cache
    full_k = rng.randn(B, history + T, Hkv, D).astype(np.float32)
    full_v = rng.randn(B, history + T, Hkv, D).astype(np.float32)
    if history > 0:
        hist_slots = compute_slot_mapping(tables, jnp.zeros((B,), jnp.int32),
                                          jnp.full((B,), history, jnp.int32),
                                          history, block_size)
        kv_cache = fill_kv_cache(
            kv_cache,
            jnp.asarray(full_k[:, :history].reshape(B * history, Hkv, D)),
            jnp.asarray(full_v[:, :history].reshape(B * history, Hkv, D)),
            hist_slots, jnp.int32(0))

    # fill the chunk's own KV then attend
    chunk_k = full_k[:, history:history + T]
    chunk_v = full_v[:, history:history + T]
    slots = compute_slot_mapping(tables, history_lens, q_lens, T, block_size)
    kv_cache = fill_kv_cache(kv_cache,
                             jnp.asarray(chunk_k.reshape(B * T, Hkv, D)),
                             jnp.asarray(chunk_v.reshape(B * T, Hkv, D)),
                             slots, jnp.int32(0))

    q = rng.randn(B, T, Hq, D).astype(np.float32)
    out = paged_attention(jnp.asarray(q), kv_cache, tables,
                          history_lens, q_lens, scale, jnp.int32(0), Hkv)
    out = np.asarray(out)

    for b in range(B):
        expect = naive_attention(q[b], full_k[b, :history + qlen],
                                 full_v[b, :history + qlen], history, qlen, scale)
        np.testing.assert_allclose(out[b, :qlen], expect[:qlen], rtol=2e-4, atol=2e-4)


def test_fill_kv_cache_padding_block():
    """Padded tokens scatter into reserved block 0 and leave real blocks intact."""
    B, T, Hkv, D, block_size = 1, 8, 2, 4, 16
    _, rowp = kv_row_width(Hkv, D)
    kv_cache = jnp.zeros((1, 4, 2, block_size, rowp), jnp.float32)
    tables = jnp.asarray([[1]], dtype=jnp.int32)
    q_lens = jnp.asarray([3], jnp.int32)   # 3 valid of 8
    slots = compute_slot_mapping(tables, jnp.zeros((1,), jnp.int32), q_lens,
                                 T, block_size)
    k_new = jnp.ones((T, Hkv, D), jnp.float32)
    kv_cache = fill_kv_cache(kv_cache, k_new, k_new, slots, jnp.int32(0))
    k, v = split_kv_planes(jnp.asarray(kv_cache), Hkv, D)
    k = np.asarray(k)   # [1, NB, BS, Hkv, D]
    # valid tokens landed in block 1
    assert k[0, 1, :3].sum() == 3 * Hkv * D
    assert k[0, 1, 3:].sum() == 0
    # other real blocks untouched
    assert k[0, 2:].sum() == 0


def test_sliding_window_mask():
    rng = np.random.RandomState(1)
    B, T, Hq, Hkv, D = 1, 1, 2, 2, 8
    block_size, W = 16, 2
    _, rowp = kv_row_width(Hkv, D)
    kv_cache = jnp.asarray(rng.randn(1, 4, 2, block_size, rowp).astype(np.float32))
    tables = jnp.asarray([[1, 2]], jnp.int32)
    history = jnp.asarray([20], jnp.int32)
    q_lens = jnp.asarray([1], jnp.int32)
    q = jnp.asarray(rng.randn(B, T, Hq, D).astype(np.float32))
    full = paged_attention(q, kv_cache, tables, history, q_lens, 0.35,
                           jnp.int32(0), Hkv)
    windowed = paged_attention(q, kv_cache, tables, history, q_lens, 0.35,
                               jnp.int32(0), Hkv, window_size=4)
    assert not np.allclose(np.asarray(full), np.asarray(windowed))
