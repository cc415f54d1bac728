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
                  v_new: jax.Array, slot_mapping: jax.Array, layer: jax.Array,
                  ) -> Tuple[jax.Array, jax.Array]:
    """Scatter new K/V rows into layer ``layer`` of the full paged cache.

    The FULL cache flows through the layer loop as a scan carry and is updated with a
    layer-offset scatter — never sliced per layer.  (Slicing + re-inserting a layer's
    cache would make XLA materialize per-layer copies; the scatter is a true in-place
    update on the donated buffer.)

    Args:
      k_cache/v_cache: [L, Hkv, num_blocks, block_size, D] — kv-head-major,
                       slot-major pages so one token's K vector is a contiguous
                       [D] row (scatter windows and page DMAs are both row-runs).
      k_new/v_new:     [num_tokens, Hkv, D]
      slot_mapping:    [num_tokens] flat slot = block_id * block_size + offset.
                       Padded tokens must map into the reserved padding block
                       (block 0), so scatters of padding are harmless.
      layer:           scalar int32 — which layer's region to write.

    The scatter runs on a flat 2-D [rows, D] bitcast view with [1, D] update
    windows — the canonical layout-neutral form.  (Scattering into a >=3-D view or
    into lane-dim columns makes XLA's layout assignment pick a scatter-friendly
    layout that conflicts with the attention kernel's, and it then keeps TWO copies
    of the multi-GB cache per step.)
    """
    from .kv_quant import (QuantKV, QuantKV4, deint_scale_pos, quantize_rows,
                           quantize_rows_int4)

    if isinstance(k_cache, QuantKV4):
        return _fill_kv4(k_cache, v_cache, k_new, v_new, slot_mapping, layer)

    L, h, nb, bs, d = k_cache.shape
    if k_new.shape[-1] < d:       # cache head_dim is lane-padded; zero-fill the tail
        pad = [(0, 0)] * (k_new.ndim - 1) + [(0, d - k_new.shape[-1])]
        k_new = jnp.pad(k_new, pad)
        v_new = jnp.pad(v_new, pad)
    rows = ((layer * h + jnp.arange(h, dtype=jnp.int32))[:, None] * (nb * bs)
            + slot_mapping[None, :])                               # [Hkv, N]
    n = slot_mapping.shape[0]
    k_upd = jnp.swapaxes(k_new, 0, 1).reshape(h * n, d)
    v_upd = jnp.swapaxes(v_new, 0, 1).reshape(h * n, d)

    if isinstance(k_cache, QuantKV):
        # per-token int8: quantize each new row online, scatter data + scale
        k_upd, k_sc = quantize_rows(k_upd)
        v_upd, v_sc = quantize_rows(v_upd)
        flat_rows = rows.reshape(-1)

        def upd(cache, q_rows, scales):
            data = cache.data.reshape(L * h * nb * bs, d).at[flat_rows].set(q_rows)
            scale = cache.scale.reshape(L * h * nb * bs).at[flat_rows].set(scales)
            return QuantKV(data.reshape(L, h, nb, bs, d),
                           scale.reshape(L, h, nb, bs))

        return upd(k_cache, k_upd, k_sc), upd(v_cache, v_upd, v_sc)

    k_flat = k_cache.reshape(L * h * nb * bs, d)
    v_flat = v_cache.reshape(L * h * nb * bs, d)
    k_flat = k_flat.at[rows.reshape(-1)].set(k_upd.astype(k_cache.dtype))
    v_flat = v_flat.at[rows.reshape(-1)].set(v_upd.astype(v_cache.dtype))
    return k_flat.reshape(L, h, nb, bs, d), v_flat.reshape(L, h, nb, bs, d)


def _fill_kv4(k_cache, v_cache, k_new, v_new, slot_mapping, layer):
    """Append rows into token-pair-packed int4 caches (see QuantKV4).

    A token's 4-bit row shares its byte row with its slot neighbor, so the
    write is a gather -> nibble-merge -> scatter, run as two parity rounds
    (even slots then odd) so a pair written in the same call never races.
    Off-parity entries are routed to byte row 0 (padding-block garbage)
    instead of being masked, keeping the scatter shape static.
    """
    from .kv_quant import QuantKV4, deint_scale_pos, quantize_rows_int4

    L, h, nb, bs2, d = k_cache.data.shape
    bs = bs2 * 2
    if k_new.shape[-1] < d:
        pad = [(0, 0)] * (k_new.ndim - 1) + [(0, d - k_new.shape[-1])]
        k_new = jnp.pad(k_new, pad)
        v_new = jnp.pad(v_new, pad)
    n = slot_mapping.shape[0]
    k_upd = jnp.swapaxes(k_new, 0, 1).reshape(h * n, d)
    v_upd = jnp.swapaxes(v_new, 0, 1).reshape(h * n, d)

    block = slot_mapping // bs
    off = slot_mapping % bs
    head_base = (layer * h + jnp.arange(h, dtype=jnp.int32))        # [h]
    pair_rows = (head_base[:, None] * (nb * bs2)
                 + (block * bs2 + off // 2)[None, :]).reshape(-1)   # [h*n]
    sc_rows = (head_base[:, None] * (nb * bs)
               + (block * bs + deint_scale_pos(off, bs))[None, :]).reshape(-1)
    odd = jnp.tile(off % 2, (h,))                                   # [h*n]

    def upd(cache, rows_f):
        q, sc, mn = quantize_rows_int4(rows_f)                      # [h*n, d]
        flat = cache.data.reshape(L * h * nb * bs2, d)
        for parity in (0, 1):
            sel = odd == parity
            rows = jnp.where(sel, pair_rows, 0)
            cur = flat[rows]
            if parity == 0:
                merged = (cur & jnp.uint8(0xF0)) | q
            else:
                merged = (cur & jnp.uint8(0x0F)) | (q << 4)
            flat = flat.at[rows].set(jnp.where(sel[:, None], merged, cur))
        scale = cache.scale.reshape(-1).at[sc_rows].set(sc)
        minv = cache.minv.reshape(-1).at[sc_rows].set(mn)
        return QuantKV4(flat.reshape(L, h, nb, bs2, d),
                        scale.reshape(L, h, nb, bs),
                        minv.reshape(L, h, nb, bs))

    return upd(k_cache, k_upd), upd(v_cache, v_upd)


def gather_dequant_kv4(cache, layer, block_tables):
    """[Hkv, B, S, D] f32 token-order dequantized view of the gathered blocks
    of one layer of a QuantKV4 cache (reference/chunked-prefill path)."""
    data = jax.lax.dynamic_index_in_dim(cache.data, layer, 0, keepdims=False)
    scale = jax.lax.dynamic_index_in_dim(cache.scale, layer, 0, keepdims=False)
    minv = jax.lax.dynamic_index_in_dim(cache.minv, layer, 0, keepdims=False)
    Hkv, NB, bs2, d = data.shape
    B, W = block_tables.shape
    packed = data[:, block_tables]                       # [Hkv, B, W, bs2, d]
    lo = (packed & 0xF).astype(jnp.float32)
    hi = (packed >> 4).astype(jnp.float32)
    # token order: lo[r] is slot 2r, hi[r] is slot 2r+1 -> interleave
    q = jnp.stack([lo, hi], axis=4).reshape(Hkv, B, W, 2 * bs2, d)
    # scales are stored de-interleaved ([even | odd]); restore token order
    def tok_order(x):
        g = x[:, block_tables]                           # [Hkv, B, W, bs]
        g = g.reshape(Hkv, B, W, 2, bs2)
        return jnp.swapaxes(g, 3, 4).reshape(Hkv, B, W, 2 * bs2)
    sc = tok_order(scale)
    mn = tok_order(minv)
    kv = q * sc[..., None] + mn[..., None]
    S = W * 2 * bs2
    return kv.reshape(Hkv, B, S, d)


def paged_attention_reference(
    q: jax.Array,                 # [B, T, Hq, D]
    k_cache: jax.Array,           # [Hkv, num_blocks, D, block_size]
    v_cache: jax.Array,           # [Hkv, num_blocks, D, block_size]
    block_tables: jax.Array,      # [B, W] physical block ids (padded with 0)
    history_lens: jax.Array,      # [B] tokens already in cache before this chunk
    q_lens: jax.Array,            # [B] valid query tokens in this chunk (<= T)
    scale: float,
    logit_softcap: Optional[float] = None,
    window_size=None,                      # int, or traced per-layer i32 scalar
    k_scale: Optional[jax.Array] = None,   # [Hkv, NB, BS] per-token int8 scales
    v_scale: Optional[jax.Array] = None,
    sinks: Optional[jax.Array] = None,     # [Hq] learned attention-sink logits
) -> jax.Array:
    """Attention of chunk queries against the paged cache (which already contains the
    chunk's own K/V — call fill_kv_cache first).  Pure-XLA reference path.
    k_cache/v_cache here are one layer's [Hkv, NB, BS, D].

    With ``k_scale/v_scale`` the cache pages are per-token int8; scales are
    gathered alongside and dequantization happens on the gathered rows only
    (never on the full cache).

    Query i of row b has absolute position ``history_lens[b] + i`` and attends to all
    cache positions ``j <= pos`` (causal), optionally windowed.  Returns [B, T, Hq, D].
    """
    B, T, Hq, D = q.shape
    Hkv, _, block_size, _ = k_cache.shape
    W = block_tables.shape[1]
    S = W * block_size
    G = Hq // Hkv

    # gather KV: [Hkv, B, W, bs, Dp] -> [Hkv, B, S, D] (drop lane padding if any)
    k = k_cache[:, block_tables].reshape(Hkv, B, S, -1)[..., :D]
    v = v_cache[:, block_tables].reshape(Hkv, B, S, -1)[..., :D]
    if k_scale is not None:
        k = k.astype(jnp.float32) * k_scale[:, block_tables].reshape(
            Hkv, B, S)[..., None]
        v = v.astype(jnp.float32) * v_scale[:, block_tables].reshape(
            Hkv, B, S)[..., None]
    return attention_dense_gathered(q, k, v, history_lens, scale,
                                    logit_softcap, window_size, sinks)


def attention_dense_gathered(q, k, v, history_lens, scale,
                             logit_softcap=None, window_size=None, sinks=None):
    """Attention math over already-gathered dense KV [Hkv, B, S, Dp>=D]."""
    B, T, Hq, D = q.shape
    Hkv, _, S, _ = k.shape
    k = k[..., :D]
    v = v[..., :D]
    G = Hq // Hkv
    qg = q.reshape(B, T, Hkv, G, D)
    scores = jnp.einsum('bthgd,hbsd->bhgts', qg.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale            # [B,Hkv,G,T,S]
    if logit_softcap is not None and logit_softcap > 0:
        scores = jnp.tanh(scores / logit_softcap) * logit_softcap

    pos_q = history_lens[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]   # [B,T]
    pos_k = jnp.arange(S, dtype=jnp.int32)[None, :]                           # [1,S]
    mask = pos_k[:, None, :] <= pos_q[:, :, None]                             # [B,T,S]
    if window_size is not None:
        if isinstance(window_size, int):
            if window_size > 0:
                mask &= pos_k[:, None, :] > (pos_q[:, :, None] - window_size)
        else:
            # traced per-layer window (gpt-oss alternates windowed/full
            # layers inside one scan); <= 0 disables
            w = jnp.asarray(window_size)
            wm = pos_k[:, None, :] > (pos_q[:, :, None] - w)
            mask &= jnp.where(w > 0, wm, True)
    scores = jnp.where(mask[:, None, None, :, :], scores, NEG_INF)

    if sinks is not None:
        # learned per-head sink logit joins the softmax denominator only
        # (reference: flashattention.py s_aux — l += exp(sink - m))
        sk = sinks.astype(jnp.float32).reshape(Hkv, G)[None, :, :, None]
        m = jnp.maximum(jnp.max(scores, axis=-1), sk)            # [B,Hkv,G,T]
        e = jnp.exp(scores - m[..., None])
        denom = e.sum(-1) + jnp.exp(sk - m)
        probs = e / denom[..., None]
    else:
        probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum('bhgts,hbsd->bthgd', probs, v.astype(jnp.float32))
    return out.reshape(B, T, Hq, D).astype(q.dtype)


def paged_attention(q, k_cache, v_cache, block_tables, history_lens, q_lens, scale,
                    layer, logit_softcap=None, window_size=None,
                    chunk_kv: Optional[Tuple[jax.Array, jax.Array]] = None,
                    fresh_prefill: bool = False,
                    force_reference: bool = False,
                    sinks: Optional[jax.Array] = None):
    """Dispatch over the attention specializations.  ``k_cache/v_cache`` are the FULL
    [L, Hkv, NB, BS, D] caches; ``layer`` selects the region.

    * T==1 (decode) on TPU -> Pallas paged-decode kernel (ops/pallas/paged_decode.py)
    * T>1 with no history (fresh prefill) on TPU -> dense flash attention over the
      chunk's own K/V (``chunk_kv``), touching the cache not at all
    * otherwise (chunked continuation, prefix-cache hits, CPU tests) -> XLA reference
      over a dynamic layer slice
    """
    from .kv_quant import QuantKV, QuantKV4

    T = q.shape[1]
    if sinks is not None or not isinstance(window_size, (int, type(None))):
        # sink logits / traced per-layer windows: Pallas kernels don't model
        # them yet; the XLA reference handles both
        force_reference = True
    if force_reference:
        # context-parallel decode: the cache's block_size dim is sharded over
        # the 'cp' mesh axis; the XLA reference path computes rank-local
        # partial softmax stats and GSPMD inserts the cross-'cp' (max, sum)
        # reductions — the TPU-native analog of cp_utils.h partial-(M,L)
        # exchange.  Pallas kernels need shard_map and are bypassed here.
        if isinstance(k_cache, QuantKV4):
            k = gather_dequant_kv4(k_cache, layer, block_tables)
            v = gather_dequant_kv4(v_cache, layer, block_tables)
            return attention_dense_gathered(q, k, v, history_lens, scale,
                                            logit_softcap, window_size, sinks)
        if isinstance(k_cache, QuantKV):
            k_l = jax.tree_util.tree_map(
                lambda x: jax.lax.dynamic_index_in_dim(x, layer, 0,
                                                       keepdims=False), k_cache)
            v_l = jax.tree_util.tree_map(
                lambda x: jax.lax.dynamic_index_in_dim(x, layer, 0,
                                                       keepdims=False), v_cache)
            return paged_attention_reference(
                q, k_l.data, v_l.data, block_tables, history_lens, q_lens,
                scale, logit_softcap, window_size, k_scale=k_l.scale,
                v_scale=v_l.scale, sinks=sinks)
        k_l = jax.lax.dynamic_index_in_dim(k_cache, layer, 0, keepdims=False)
        v_l = jax.lax.dynamic_index_in_dim(v_cache, layer, 0, keepdims=False)
        return paged_attention_reference(q, k_l, v_l, block_tables,
                                         history_lens, q_lens, scale,
                                         logit_softcap, window_size,
                                         sinks=sinks)
    if isinstance(k_cache, QuantKV4):
        # int4 token-pair-packed cache (quant_policy=8)
        if (_on_tpu() and fresh_prefill and chunk_kv is not None
                and logit_softcap is None and window_size is None and T >= 128):
            return _flash_prefill(q, chunk_kv[0], chunk_kv[1], scale)
        if _on_tpu() and T == 1 and window_size is None:
            from .pallas.paged_decode import paged_decode_attention_quant4
            out = paged_decode_attention_quant4(
                q[:, 0], k_cache, v_cache, block_tables,
                history_lens + 1, layer, scale, logit_softcap=logit_softcap)
            return out[:, None]
        k = gather_dequant_kv4(k_cache, layer, block_tables)
        v = gather_dequant_kv4(v_cache, layer, block_tables)
        return attention_dense_gathered(q, k, v, history_lens, scale,
                                        logit_softcap, window_size)
    if isinstance(k_cache, QuantKV):
        # per-token int8 cache: fresh prefill takes the flash kernel (it
        # attends over the chunk's raw K/V, untouched cache); decode takes the
        # quantized Pallas kernel with in-VMEM scale-DMA dequant; chunked
        # continuation uses the gather+dequant reference.
        if (_on_tpu() and fresh_prefill and chunk_kv is not None
                and logit_softcap is None and window_size is None and T >= 128):
            return _flash_prefill(q, chunk_kv[0], chunk_kv[1], scale)
        if _on_tpu() and T == 1 and window_size is None:
            from .pallas.paged_decode import paged_decode_attention_quant
            out = paged_decode_attention_quant(
                q[:, 0], k_cache, v_cache, block_tables,
                history_lens + 1, layer, scale, logit_softcap=logit_softcap)
            return out[:, None]
        k_l = jax.tree_util.tree_map(
            lambda x: jax.lax.dynamic_index_in_dim(x, layer, 0, keepdims=False),
            k_cache)
        v_l = jax.tree_util.tree_map(
            lambda x: jax.lax.dynamic_index_in_dim(x, layer, 0, keepdims=False),
            v_cache)
        return paged_attention_reference(
            q, k_l.data, v_l.data, block_tables, history_lens, q_lens, scale,
            logit_softcap, window_size, k_scale=k_l.scale, v_scale=v_l.scale)

    if _on_tpu() and window_size is None:
        if T == 1:
            from .pallas.paged_decode import paged_decode_attention
            out = paged_decode_attention(
                q[:, 0], k_cache, v_cache, block_tables,
                history_lens + 1,     # kv length includes the token just filled
                layer, scale, logit_softcap=logit_softcap)
            return out[:, None]
        import os
        if fresh_prefill and chunk_kv is not None and logit_softcap is None \
                and T >= 128:
            # Note on the tunneled TPU CI stack: its remote compile/execute
            # service intermittently wedges on LARGE programs (differentials
            # showed identical programs — incl. this kernel inside the layer
            # scan — completing in seconds during healthy windows and hanging
            # in _pjit_lower or post-dispatch during degraded ones; bare scans,
            # standalone kernels and small programs always run).  The kernels
            # themselves pass all tests.  Escape hatches for degraded stacks:
            # LMDEPLOY_TPU_DISABLE_FLASH=1 (block-table gather path) or
            # LMDEPLOY_TPU_DENSE_PREFILL=1 (q-tiled dense XLA path).
            if os.environ.get('LMDEPLOY_TPU_DISABLE_FLASH') == '1':
                pass
            elif os.environ.get('LMDEPLOY_TPU_DENSE_PREFILL') == '1':
                return _dense_prefill(q, chunk_kv[0], chunk_kv[1], scale)
            else:
                return _flash_prefill(q, chunk_kv[0], chunk_kv[1], scale)
    k_l = jax.lax.dynamic_index_in_dim(k_cache, layer, 0, keepdims=False)
    v_l = jax.lax.dynamic_index_in_dim(v_cache, layer, 0, keepdims=False)
    return paged_attention_reference(q, k_l, v_l, block_tables, history_lens,
                                     q_lens, scale, logit_softcap, window_size)


def _flash_prefill(q: jax.Array, k: jax.Array, v: jax.Array, scale: float,
                   ) -> jax.Array:
    """Dense causal flash attention for fresh prefill chunks (history == 0).

    Padding queries (i >= q_len) only see causal keys, so garbage rows stay finite
    and are discarded by the last-token gather.  Uses this framework's own kernel
    (ops/pallas/flash_prefill.py).
    """
    from .pallas.flash_prefill import flash_prefill_attention
    return flash_prefill_attention(q, k, v, scale)


def _dense_prefill(q: jax.Array, k: jax.Array, v: jax.Array, scale: float,
                   tile_q: int = 256) -> jax.Array:
    """Fresh-prefill causal attention on the chunk's own dense K/V, q-tiled so the
    score matrix stays bounded ([B, Hkv, G, TQ, T] per tile).  Pure XLA."""
    B, T, Hq, D = q.shape
    Hkv = k.shape[2]
    G = Hq // Hkv
    tile_q = min(tile_q, T)
    if T % tile_q:
        tile_q = T
    nq = T // tile_q

    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    qg = q.reshape(B, nq, tile_q, Hkv, G, D).astype(jnp.float32)
    k_pos = jnp.arange(T, dtype=jnp.int32)

    def one_tile(i):
        qt = jax.lax.dynamic_index_in_dim(qg, i, 1, keepdims=False)  # [B,TQ,Hkv,G,D]
        s = jnp.einsum('bthgd,bshd->bhgts', qt, kf) * scale
        q_pos = i * tile_q + jnp.arange(tile_q, dtype=jnp.int32)
        mask = k_pos[None, :] <= q_pos[:, None]                      # [TQ, T]
        s = jnp.where(mask[None, None, None], s, NEG_INF)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum('bhgts,bshd->bthgd', p, vf)                # [B,TQ,Hkv,G,D]

    if nq == 1:
        out = one_tile(0).reshape(B, T, Hkv, G, D)
    else:
        tiles = jax.lax.map(one_tile, jnp.arange(nq))                # [nq,B,TQ,...]
        out = jnp.moveaxis(tiles, 0, 1).reshape(B, T, Hkv, G, D)
    return out.reshape(B, T, Hq, D).astype(q.dtype)


def _on_tpu() -> bool:
    import jax
    try:
        return jax.default_backend() in ('tpu', 'axon')
    except Exception:
        return False


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
