"""Paged attention over a block-table KV cache — layout + XLA reference paths.

Reference analog: the CUDA attention stack in ``src/turbomind/kernels/attention/`` (prefill
``attention.cu``, decode ``decoding.cu`` split-K flash decoding, paged block iteration
``block_iterator.h``) and the Triton kernels in ``lmdeploy/pytorch/kernels/cuda/
pagedattention.py`` / ``fill_kv_cache.py``.

Design notes (TPU-first, round-2 layout):
  * One unified entry point serves prefill chunks, chunked-prefill continuation, and
    decode — decode is just a T=1 chunk with history.  Static shapes select the
    specialization; the engine buckets (B, T, table_width).
  * The cache is ONE array ``[L, num_blocks, 2, block_size, HDp]``: each page holds
    a K plane and a V plane of ``[block_size, Hkv*D]`` token rows (lane dim padded to
    a 128 multiple).  Chosen because decode-attention on TPU is DMA-ISSUE-bound, not
    bandwidth-bound: the round-1 head-major layout ([L, Hkv, NB, BS, Dp]) needed
    2*Hkv*pages DMAs per row per layer (measured 263 us/layer at TinyLlama bs64 —
    17x the data floor) while one packed page ([2, BS, HDp], K and V adjacent) is a
    single DMA.  Keeping K and V as separate PLANES (not interleaved per token) lets
    the decode kernel's pv product and accumulator span only the HDp lanes instead
    of 2*HDp.  Tensor-parallel sharding splits the last (head-major) dim, which is
    head-aligned for any tp dividing Hkv.
  * "fill" is a flat scatter of one [HDp] line per token per plane — layout-neutral
    2-D form ([rows, HDp] with [1, HDp] windows); scattering into lane columns or
    higher-D views makes XLA keep two copies of the multi-GB cache per step.
  * GQA is computed without materializing repeated KV heads (einsum grouping).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = float('-inf')


def kv_row_width(num_kv_heads: int, head_dim: int) -> Tuple[int, int]:
    """(valid, padded) lane width of one K or V plane row (Hkv * D)."""
    row = num_kv_heads * head_dim
    return row, ((row + 127) // 128) * 128


def plane_rows(x: jax.Array, padded: int) -> jax.Array:
    """[N, Hkv, D] -> [N, HDp] head-major plane rows (lane padded)."""
    n = x.shape[0]
    rows = x.reshape(n, -1)
    if rows.shape[-1] < padded:
        rows = jnp.pad(rows, ((0, 0), (0, padded - rows.shape[-1])))
    return rows


def split_kv_planes(pages: jax.Array, num_kv_heads: int, head_dim: int):
    """[..., 2, BS, HDp] -> (k [..., BS, Hkv, D], v [..., BS, Hkv, D])."""
    hd = num_kv_heads * head_dim
    k = pages[..., 0, :, :hd]
    v = pages[..., 1, :, :hd]
    shp = k.shape[:-1] + (num_kv_heads, head_dim)
    return k.reshape(shp), v.reshape(shp)


def fill_kv_cache(kv_cache, k_new: jax.Array, v_new: jax.Array,
                  slot_mapping: jax.Array, layer: jax.Array,
                  page_tables: Optional[jax.Array] = None):
    """Scatter new K/V rows into layer ``layer`` of the unified paged cache.

    The FULL cache flows through the layer loop as a scan carry and is updated with a
    layer-offset scatter — never sliced per layer.  (Slicing + re-inserting a layer's
    cache would make XLA materialize per-layer copies; the scatter is a true in-place
    update on the donated buffer.)

    Args:
      kv_cache:     [L, num_blocks, block_size, ROWp] (or QuantKV/QuantKV4 pytrees)
      k_new/v_new:  [num_tokens, Hkv, D]
      slot_mapping: [num_tokens] flat slot = block_id * block_size + offset.
                    Padded tokens must map into the reserved padding block
                    (block 0), so scatters of padding are harmless.
      layer:        scalar int32 — which layer's region to write.
      page_tables:  [B, W] block tables, passed ONLY for fresh prefill
                    (history == 0, contiguous positions).  Enables the
                    page-granular write path: whole [2, BS, HDp] pages scatter
                    in one op instead of per-token rows — measured 0.68 ms/layer
                    -> ~0 at [2, 2048] (the row scatter was 10% of the whole
                    prefill step).  Rows shorter than T write garbage into
                    their final partial page beyond q_len (masked by length in
                    attention, overwritten by the next chunk/decode append) and
                    into padding block 0.
    """
    from .kv_quant import QuantKV, QuantKV4, QuantKVTurbo, deint_scale_pos, \
        quantize_rows, quantize_rows_int4

    import os as _os
    sim = _os.environ.get('LMDEPLOY_TPU_KV_SIM')
    if sim and not isinstance(kv_cache, (QuantKV, QuantKV4, QuantKVTurbo)):
        # accuracy-isolation harness (eval/turbo_sim.py / ppl_gate
        # kv_turbo_sim): quant->dequant rows through the turbo codec but
        # store DEQUANTIZED values in the plain cache, so the simulation
        # runs the exact serving path minus the packed kernels.
        from .kv_quant import (dequantize_turbo_k, dequantize_turbo_v,
                               hadamard_rotate, hadamard_rotate_inv,
                               quantize_rows_turbo_k, quantize_rows_turbo_v)
        if sim in ('turbo', 'turbo_k'):
            nib, mse, qjl = quantize_rows_turbo_k(hadamard_rotate(k_new))
            k_new = hadamard_rotate_inv(
                dequantize_turbo_k(nib, mse, qjl)).astype(k_new.dtype)
        if sim in ('turbo', 'turbo_v'):
            code, norm = quantize_rows_turbo_v(hadamard_rotate(v_new))
            v_new = hadamard_rotate_inv(
                dequantize_turbo_v(code, norm)).astype(v_new.dtype)

    if page_tables is not None and not isinstance(
            kv_cache, (QuantKV, QuantKV4, QuantKVTurbo)):
        L, nb, two, bs, hdp = kv_cache.shape
        B = page_tables.shape[0]
        T = k_new.shape[0] // B
        if T % bs == 0 and page_tables.shape[1] >= T // bs:
            n_pages = T // bs
            rows_k = plane_rows(k_new, hdp).reshape(B, n_pages, bs, hdp)
            rows_v = plane_rows(v_new, hdp).reshape(B, n_pages, bs, hdp)
            upd = jnp.stack([rows_k, rows_v], axis=2).reshape(
                B * n_pages, two, bs, hdp).astype(kv_cache.dtype)
            idx = page_tables[:, :n_pages].reshape(-1)
            return kv_cache.at[layer, idx].set(upd)

    if isinstance(kv_cache, QuantKV4):
        return _fill_kv4(kv_cache, k_new, v_new, slot_mapping, layer)
    if isinstance(kv_cache, QuantKVTurbo):
        return _fill_turbo(kv_cache, k_new, v_new, slot_mapping, layer)

    def plane_idx(nb, bs):
        # flat row index into the [L*NB*2*BS, HDp] view for (k plane, v plane)
        block = slot_mapping // bs
        off = slot_mapping % bs
        k_idx = ((layer * nb + block) * 2 + 0) * bs + off
        return k_idx, k_idx + bs

    if isinstance(kv_cache, QuantKV):
        L, nb, two, bs, hdp = kv_cache.data.shape
        h = kv_cache.scale.shape[-1]
        # per-(token, head) int8 with the head axis quantized independently
        kq, ksc = quantize_rows(k_new)                   # [N,Hkv,D], [N,Hkv]
        vq, vsc = quantize_rows(v_new)
        k_idx, v_idx = plane_idx(nb, bs)
        data = kv_cache.data.reshape(L * nb * 2 * bs, hdp)
        data = data.at[jnp.concatenate([k_idx, v_idx])].set(
            jnp.concatenate([plane_rows(kq, hdp), plane_rows(vq, hdp)]
                            ).astype(kv_cache.data.dtype))
        # scales [L, NB, 2, BS, Hkv] (token-major): each token's scales are
        # one [Hkv] ROW, scattered IN THE NATIVE 5-D LAYOUT with multidim
        # indices.  Both a flattened-row scatter and the old per-element
        # [.., Hkv, BS] scatter made XLA pick a different operand layout
        # than the scan carry and insert TWO full-array layout-conversion
        # copies per layer (12.3 ms/step at llama2-7b MHA geometry).
        block = slot_mapping // bs
        off = slot_mapping % bs
        n = slot_mapping.shape[0]
        li = jnp.full((2 * n,), layer, jnp.int32)
        blocks2 = jnp.tile(block, 2)
        planes2 = jnp.repeat(jnp.arange(2, dtype=jnp.int32), n)
        offs2 = jnp.tile(off, 2)
        scale = kv_cache.scale.at[li, blocks2, planes2, offs2].set(
            jnp.concatenate([ksc, vsc]), unique_indices=True, mode='drop')
        return QuantKV(data.reshape(L, nb, 2, bs, hdp), scale)

    L, nb, two, bs, hdp = kv_cache.shape
    k_idx, v_idx = plane_idx(nb, bs)
    flat = kv_cache.reshape(L * nb * 2 * bs, hdp)
    # unique_indices: real rows occupy distinct slots by construction and the
    # k/v planes never collide; only PADDING rows alias (they all land in the
    # reserved block 0, whose contents are don't-care), so letting XLA emit
    # the unordered vectorized scatter without its serializing dedup pass is
    # semantically safe (measured 18us/layer for a 32KB write without it).
    flat = flat.at[jnp.concatenate([k_idx, v_idx])].set(
        jnp.concatenate([plane_rows(k_new, hdp), plane_rows(v_new, hdp)]
                        ).astype(kv_cache.dtype),
        unique_indices=True, mode='drop')
    return flat.reshape(L, nb, 2, bs, hdp)


def _fill_turbo(kv_cache, k_new, v_new, slot_mapping, layer):
    """Append rows into the TurboQuant k4v2 cache (quant_policy=42).

    Both K and V rows are Hadamard-rotated per head, then coded (K: 3-bit
    Lloyd-Max + QJL sign nibble; V: 2-bit Lloyd-Max) — reference
    fill_kv_cache.py:325-515 + turbo_quant.py hadamard_rotate.  Byte packing
    follows the reference's shift pattern: K byte at packed coord ``d`` holds
    raw coords ``(d, d + D/2)``; V byte holds ``(d, d+D/4, d+D/2, d+3D/4)``
    at 2-bit fields.
    """
    from .kv_quant import (QuantKVTurbo, hadamard_rotate, quantize_rows_turbo_k,
                           quantize_rows_turbo_v)

    L, nb, two, bs, rowt = kv_cache.data.shape
    h = kv_cache.meta.shape[4]
    N, Hkv, D = k_new.shape
    HD = Hkv * D
    H2 = HD // 2

    # PLANAR packing over the head-major flattened row P[Hkv*D]: K byte j
    # holds nibbles (P[j], P[j + HD/2]); V byte j holds 2-bit fields
    # (P[j], P[j + HD/2]) in its low nibble (the upper nibble is free — the
    # row space is allocated at K's width anyway).  Halves decode into a
    # single lane-aligned concat at HD/2, so the Pallas decode kernel needs
    # no lane shuffles when HD/2 is a multiple of 128.
    nib, mse, qjl = quantize_rows_turbo_k(hadamard_rotate(k_new))
    nibf = nib.reshape(N, HD)
    kb = nibf[:, :H2] | (nibf[:, H2:] << 4)               # [N, HD/2]
    code, vnorm = quantize_rows_turbo_v(hadamard_rotate(v_new))
    cf = code.reshape(N, HD)
    vb = cf[:, :H2] | (cf[:, H2:] << 2)                   # [N, HD/2]

    block = slot_mapping // bs
    off = slot_mapping % bs
    k_idx = ((layer * nb + block) * 2 + 0) * bs + off
    flat = kv_cache.data.reshape(L * nb * 2 * bs, rowt)
    flat = flat.at[jnp.concatenate([k_idx, k_idx + bs])].set(
        jnp.concatenate([plane_rows(kb, rowt), plane_rows(vb, rowt)]))

    # meta [L, NB, 2, 2, Hkv, BS]: (K: mse, qjl), (V: norm, unused)
    base = (layer * nb + block) * 2                              # [N]
    h_idx = jnp.arange(h, dtype=jnp.int32)

    def pos(kv, comp):
        return ((((base[:, None] + kv) * 2 + comp) * h + h_idx[None, :]) * bs
                + off[:, None]).reshape(-1)

    meta = kv_cache.meta.reshape(-1)
    meta = meta.at[pos(0, 0)].set(mse.reshape(-1))
    meta = meta.at[pos(0, 1)].set(qjl.reshape(-1))
    meta = meta.at[pos(1, 0)].set(vnorm.reshape(-1))
    return QuantKVTurbo(flat.reshape(L, nb, 2, bs, rowt),
                        meta.reshape(L, nb, 2, 2, h, bs))


def _fill_kv4(kv_cache, k_new, v_new, slot_mapping, layer):
    """Append rows into token-pair-packed int4 unified cache (see QuantKV4).

    A token's 4-bit row shares its byte row with its slot neighbor, so the
    write is a gather -> nibble-merge -> scatter, run as two parity rounds
    (even slots then odd) so a pair written in the same call never races.
    Off-parity entries are routed to byte row 0 (padding-block garbage)
    instead of being masked, keeping the scatter shape static.
    """
    from .kv_quant import QuantKV4, deint_scale_pos, quantize_rows_int4

    L, nb, two, bs2, hdp = kv_cache.data.shape
    bs = bs2 * 2
    h = kv_cache.scale.shape[3]
    kq, ksc, kmn = quantize_rows_int4(k_new)             # [N,Hkv,D] u8 0..15
    vq, vsc, vmn = quantize_rows_int4(v_new)
    rows = jnp.concatenate([plane_rows(kq, hdp), plane_rows(vq, hdp)])
    n = slot_mapping.shape[0]

    block = slot_mapping // bs
    off = slot_mapping % bs
    k_pair = ((layer * nb + block) * 2 + 0) * bs2 + off // 2         # [N]
    pair_rows = jnp.concatenate([k_pair, k_pair + bs2])              # [2N]
    odd = jnp.tile(off % 2, 2)

    flat = kv_cache.data.reshape(L * nb * 2 * bs2, hdp)
    for parity in (0, 1):
        sel = odd == parity
        r_idx = jnp.where(sel, pair_rows, 0)
        cur = flat[r_idx]
        if parity == 0:
            merged = (cur & jnp.uint8(0xF0)) | rows
        else:
            merged = (cur & jnp.uint8(0x0F)) | (rows << 4)
        flat = flat.at[r_idx].set(jnp.where(sel[:, None], merged, cur))

    # scales/min [L, NB, 2, Hkv, BS] in de-interleaved slot order
    sc_off = deint_scale_pos(off, bs)
    base = (layer * nb + block) * 2
    h_idx = jnp.arange(h, dtype=jnp.int32)
    k_pos = ((base[:, None] + 0) * h + h_idx[None, :]) * bs + sc_off[:, None]
    v_pos = ((base[:, None] + 1) * h + h_idx[None, :]) * bs + sc_off[:, None]

    def put(dst, kvals, vvals):
        dst = dst.reshape(-1)
        dst = dst.at[k_pos.reshape(-1)].set(kvals.reshape(-1))
        dst = dst.at[v_pos.reshape(-1)].set(vvals.reshape(-1))
        return dst.reshape(L, nb, 2, h, bs)

    return QuantKV4(flat.reshape(L, nb, 2, bs2, hdp),
                    put(kv_cache.scale, ksc, vsc),
                    put(kv_cache.minv, kmn, vmn))


def gather_layer_kv(kv_cache, layer, block_tables, num_kv_heads: int,
                    head_dim: int):
    """Gather + (de)quantize one layer's pages for the chunk's rows.

    Returns (k, v) as [Hkv, B, S, D] f32/bf16 token-order views — the
    always-correct XLA path (chunked prefill continuation, CPU tests, CP
    decode where GSPMD inserts the cross-shard softmax collectives).
    """
    from .kv_quant import (QuantKV, QuantKV4, QuantKVTurbo, dequantize_turbo_k,
                           dequantize_turbo_v)

    B, W = block_tables.shape

    if isinstance(kv_cache, QuantKVTurbo):
        # returns K/V in the ROTATED domain — paged_attention rotates q to
        # match and inverse-rotates the output (reference default.py:354-383)
        data = jax.lax.dynamic_index_in_dim(kv_cache.data, layer, 0, False)
        meta = jax.lax.dynamic_index_in_dim(kv_cache.meta, layer, 0, False)
        NB, _, bs, rowt = data.shape
        pages = data[block_tables]                       # [B, W, 2, BS, ROWt]
        mg = meta[block_tables]                          # [B, W, 2, 2, Hkv, BS]

        def mrow(kv, comp):
            # [B, W, Hkv, BS] -> token-order [B, W, BS, Hkv]
            return jnp.moveaxis(mg[:, :, kv, comp], 2, 3)

        # planar order: K byte j = (P[j], P[j+HD/2]); V byte j = 4 quarters
        HD = num_kv_heads * head_dim
        kb = pages[:, :, 0, :, :HD // 2]
        nib = jnp.concatenate([kb & 0xF, kb >> 4], axis=-1).reshape(
            B, W, bs, num_kv_heads, head_dim)
        k = dequantize_turbo_k(nib, mrow(0, 0), mrow(0, 1))
        vb = pages[:, :, 1, :, :HD // 2]
        code = jnp.concatenate([vb & 0x3, (vb >> 2) & 0x3],
                               axis=-1).reshape(B, W, bs, num_kv_heads,
                                                head_dim)
        v = dequantize_turbo_v(code, mrow(1, 0))

        def out(x):
            return jnp.moveaxis(x, 3, 0).reshape(
                num_kv_heads, B, W * bs, head_dim)

        return out(k), out(v)

    def to_heads(x, bs):
        # [B, W, BS, Hkv*D(+pad)] -> [Hkv, B, W*BS, D]
        hd = num_kv_heads * head_dim
        x = x[..., :hd].reshape(B, W, bs, num_kv_heads, head_dim)
        return jnp.moveaxis(x, 3, 0).reshape(num_kv_heads, B, W * bs, head_dim)

    if isinstance(kv_cache, QuantKV4):
        data = jax.lax.dynamic_index_in_dim(kv_cache.data, layer, 0, False)
        scale = jax.lax.dynamic_index_in_dim(kv_cache.scale, layer, 0, False)
        minv = jax.lax.dynamic_index_in_dim(kv_cache.minv, layer, 0, False)
        NB, _, bs2, hdp = data.shape
        packed = data[block_tables]                      # [B, W, 2, bs2, HDp]
        lo = (packed & 0xF).astype(jnp.float32)
        hi = (packed >> 4).astype(jnp.float32)
        planes = jnp.stack([lo, hi], axis=4).reshape(B, W, 2, 2 * bs2, hdp)

        def tok_order(x, kv):
            # [NB, 2, Hkv, BS] de-interleaved ([even|odd]) -> token-order
            # [B, W, BS, Hkv]
            g = x[block_tables][:, :, kv]                # [B, W, Hkv, BS]
            g = g.reshape(B, W, num_kv_heads, 2, bs2)
            g = jnp.swapaxes(g, 3, 4).reshape(B, W, num_kv_heads, 2 * bs2)
            return jnp.moveaxis(g, 2, 3)                 # [B, W, BS, Hkv]

        def deq(kv):
            hd = num_kv_heads * head_dim
            q = planes[:, :, kv, :, :hd].reshape(
                B, W, 2 * bs2, num_kv_heads, head_dim)
            out = (q * tok_order(scale, kv)[..., None]
                   + tok_order(minv, kv)[..., None])
            return jnp.moveaxis(out, 3, 0).reshape(
                num_kv_heads, B, W * 2 * bs2, head_dim)

        return deq(0), deq(1)

    if isinstance(kv_cache, QuantKV):
        data = jax.lax.dynamic_index_in_dim(kv_cache.data, layer, 0, False)
        scale = jax.lax.dynamic_index_in_dim(kv_cache.scale, layer, 0, False)
        NB, _, bs, hdp = data.shape
        pages = data[block_tables].astype(jnp.float32)   # [B, W, 2, BS, HDp]
        sc = scale[block_tables]                         # [B, W, 2, BS, Hkv]
        hd = num_kv_heads * head_dim

        def deq(kv):
            x = pages[:, :, kv, :, :hd].reshape(
                B, W, bs, num_kv_heads, head_dim)
            x = x * sc[:, :, kv][..., None]
            return jnp.moveaxis(x, 3, 0).reshape(
                num_kv_heads, B, W * bs, head_dim)

        return deq(0), deq(1)

    pages = jax.lax.dynamic_index_in_dim(kv_cache, layer, 0, False)
    NB, _, bs, hdp = pages.shape
    g = pages[block_tables]                              # [B, W, 2, BS, HDp]
    return to_heads(g[:, :, 0], bs), to_heads(g[:, :, 1], bs)


def attention_dense_gathered(q, k, v, history_lens, scale,
                             logit_softcap=None, window_size=None, sinks=None,
                             block_causal=None, chunk_local=None,
                             bidir_k=None, bidir_q=None):
    """Attention math over already-gathered dense KV [Hkv, B, S, D].

    ``block_causal``: diffusion-LM block size — positions attend causally by
    BLOCK (bidirectional within a block; reference: SDAR block_sparse_size).
    ``chunk_local``: llama4 chunked attention — causal AND restricted to the
    query's own chunk of this size (traced per-layer scalar; <= 0 disables).
    ``bidir_q``/``bidir_k``: gemma3-VL image-token bidirectionality — mask
    ADDS (q image-token) & (k image-token) pairs before the window cut.
    """
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
    if block_causal:
        mask = (pos_k[:, None, :] // block_causal
                <= pos_q[:, :, None] // block_causal)                         # [B,T,S]
    else:
        mask = pos_k[:, None, :] <= pos_q[:, :, None]                         # [B,T,S]
    if chunk_local is not None:
        c = jnp.maximum(jnp.asarray(chunk_local, jnp.int32), 1)
        cm = (pos_k[:, None, :] // c) == (pos_q[:, :, None] // c)
        mask &= jnp.where(jnp.asarray(chunk_local) > 0, cm, True)
    if bidir_q is not None:
        # image tokens attend bidirectionally among themselves (reference:
        # gemma3_vl.py global_attn_mask img_mask == 2); the sliding-window
        # cut below still applies on windowed layers
        mask |= bidir_q[:, :, None] & bidir_k[:, None, :]
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


def paged_attention_reference(q, kv_cache, block_tables, history_lens, q_lens,
                              scale, layer, logit_softcap=None,
                              window_size=None, sinks=None):
    """Chunk queries against the paged unified cache (already filled) —
    pure-XLA reference path.  q: [B, T, Hq, D]."""
    Hq, D = q.shape[2], q.shape[3]
    from .kv_quant import QuantKV, QuantKV4
    if isinstance(kv_cache, QuantKV):
        hkv = kv_cache.scale.shape[-1]       # token-major [.., BS, Hkv]
    elif isinstance(kv_cache, QuantKV4):
        hkv = kv_cache.scale.shape[3]
    else:
        # ROWp >= 2*Hkv*D; the caller's q tells us Hq, config must supply Hkv
        raise TypeError('use paged_attention (carries num_kv_heads)')
    k, v = gather_layer_kv(kv_cache, layer, block_tables, hkv, D)
    return attention_dense_gathered(q, k, v, history_lens, scale,
                                    logit_softcap, window_size, sinks)


def paged_attention(q, kv_cache, block_tables, history_lens, q_lens, scale,
                    layer, num_kv_heads: int, logit_softcap=None,
                    window_size=None,
                    chunk_kv: Optional[Tuple[jax.Array, jax.Array]] = None,
                    fresh_prefill: bool = False,
                    force_reference: bool = False,
                    sinks: Optional[jax.Array] = None,
                    block_causal: Optional[int] = None,
                    chunk_local=None,
                    bidir_chunk=None,
                    cp_mesh=None):
    """Dispatch over the attention specializations.  ``kv_cache`` is the FULL
    unified cache [L, NB, BS, ROWp] (or QuantKV/QuantKV4); ``layer`` selects
    the region.

    * T==1 (decode) on TPU -> Pallas paged-decode kernel (ops/pallas/paged_decode.py)
    * T>1 with no history (fresh prefill) on TPU -> dense flash attention over the
      chunk's own K/V (``chunk_kv``), touching the cache not at all
    * otherwise (chunked continuation, prefix-cache hits, CPU tests) -> XLA reference
      over gathered pages
    """
    from .kv_quant import QuantKV, QuantKV4, QuantKVTurbo

    T = q.shape[1]
    D = q.shape[3]
    quant = isinstance(kv_cache, (QuantKV, QuantKV4))
    if isinstance(kv_cache, QuantKVTurbo):
        # TurboQuant k4v2: cache rows live in the Hadamard-rotated domain.
        # Fresh-prefill flash still runs on the chunk's own EXACT kv (as the
        # other quant policies do on TPU); every cache-reading path rotates q
        # into the cache domain and inverse-rotates the output (reference
        # backends/cuda/attention/default.py:354-383).
        import os
        from .kv_quant import hadamard_rotate, hadamard_rotate_inv
        if (_on_tpu() and fresh_prefill and chunk_kv is not None
                and logit_softcap is None and window_size is None
                and T >= 128 and not block_causal and chunk_local is None
                and bidir_chunk is None and cp_mesh is None
                and os.environ.get('LMDEPLOY_TPU_DISABLE_FLASH') != '1'):
            return _flash_prefill(q, chunk_kv[0], chunk_kv[1], scale)
        qr = hadamard_rotate(q).astype(q.dtype)
        if (T == 1 and _on_tpu() and sinks is None
                and (window_size is None
                     or (isinstance(window_size, int) and window_size <= 0))
                and not block_causal and chunk_local is None
                and cp_mesh is None
                and (num_kv_heads * D) % 256 == 0):
            # streaming path: the Pallas turbo kernel decodes the planar
            # codes arithmetically and applies norms on the score side
            from .pallas.paged_decode import paged_decode_attention
            out = paged_decode_attention(
                qr[:, 0], kv_cache, block_tables, history_lens + 1, layer,
                scale, num_kv_heads, logit_softcap=logit_softcap)
            return hadamard_rotate_inv(out[:, None]).astype(q.dtype)
        k, v = gather_layer_kv(kv_cache, layer, block_tables, num_kv_heads, D)
        out = attention_dense_gathered(
            qr, k, v, history_lens, scale, logit_softcap, window_size, sinks,
            block_causal=block_causal, chunk_local=chunk_local)
        return hadamard_rotate_inv(out).astype(q.dtype)
    if block_causal:
        # diffusion-LM block pattern: reference path only
        k, v = gather_layer_kv(kv_cache, layer, block_tables, num_kv_heads, D)
        return attention_dense_gathered(q, k, v, history_lens, scale,
                                        logit_softcap, window_size, sinks,
                                        block_causal=block_causal)
    if chunk_local is not None:
        # llama4 chunked attention (per-layer traced chunk size): the decode
        # kernel has no chunk-aligned masking — reference path
        k, v = gather_layer_kv(kv_cache, layer, block_tables, num_kv_heads, D)
        return attention_dense_gathered(q, k, v, history_lens, scale,
                                        logit_softcap, window_size, sinks,
                                        chunk_local=chunk_local)
    if bidir_chunk is not None and T > 1:
        # gemma3-VL prefill: this chunk's image tokens see each other
        # bidirectionally.  Key flags live at absolute positions
        # history + t (forward attention beyond the chunk is impossible,
        # so history keys stay causal-only).  Reference path.
        k, v = gather_layer_kv(kv_cache, layer, block_tables, num_kv_heads, D)
        B, S = q.shape[0], k.shape[2]
        pos = history_lens[:, None] + jnp.arange(T, dtype=jnp.int32)[None]
        rows = jnp.broadcast_to(jnp.arange(B)[:, None], (B, T))
        bk = jnp.zeros((B, S), bool).at[
            rows.reshape(-1), jnp.clip(pos, 0, S - 1).reshape(-1)].max(
            bidir_chunk.reshape(-1))
        return attention_dense_gathered(q, k, v, history_lens, scale,
                                        logit_softcap, window_size, sinks,
                                        bidir_k=bk, bidir_q=bidir_chunk)
    if cp_mesh is not None:
        # context-parallel decode (the cache's block_size dim is sharded over
        # 'cp'): the Pallas partial kernel + cross-'cp' (m, l, acc) combine —
        # shard_map manual over 'cp' only (ops/pallas/paged_decode.py
        # paged_decode_attention_cp; reference analog cp_utils.h:8-28).
        # LMDEPLOY_TPU_INTERPRET_PALLAS=1 drives the same path on the
        # virtual CPU mesh (tests / dryruns).
        import os
        interp = os.environ.get('LMDEPLOY_TPU_INTERPRET_PALLAS') == '1'
        if T == 1 and not quant and (_on_tpu() or interp):
            from .pallas.paged_decode import paged_decode_attention_cp
            win = None if isinstance(window_size, int) and window_size <= 0 \
                else window_size
            out = paged_decode_attention_cp(
                q[:, 0], kv_cache, block_tables, history_lens + 1, layer,
                scale, num_kv_heads, cp_mesh, logit_softcap=logit_softcap,
                window=win, sinks=sinks, interpret=not _on_tpu())
            return out[:, None]
        # prefill / chunked continuation / quantized caches under cp: the
        # XLA gather path's softmax reductions over the striped slot dim
        # become GSPMD cross-'cp' collectives
        force_reference = True
    if (sinks is not None or not isinstance(window_size, (int, type(None)))) \
            and not (_on_tpu() and T == 1 and not quant):
        # sink logits / traced per-layer windows outside the decode kernel's
        # coverage (prefill, chunked continuation, quantized caches): the
        # XLA reference handles both
        force_reference = True
    if force_reference:
        # context-parallel decode: the cache's block_size dim is sharded over
        # the 'cp' mesh axis; this path computes rank-local partial softmax
        # stats and GSPMD inserts the cross-'cp' (max, sum) reductions — the
        # TPU-native analog of cp_utils.h partial-(M,L) exchange.  Pallas
        # kernels need shard_map and are bypassed here.
        k, v = gather_layer_kv(kv_cache, layer, block_tables, num_kv_heads, D)
        return attention_dense_gathered(q, k, v, history_lens, scale,
                                        logit_softcap, window_size, sinks)

    if _on_tpu():
        if T == 1 and (not quant or window_size is None):
            from .pallas.paged_decode import paged_decode_attention
            win = None if isinstance(window_size, int) and window_size <= 0 \
                else window_size
            out = paged_decode_attention(
                q[:, 0], kv_cache, block_tables,
                history_lens + 1,     # kv length includes the token just filled
                layer, scale, num_kv_heads, logit_softcap=logit_softcap,
                window=None if quant else win, sinks=sinks)
            return out[:, None]
        import os
        if fresh_prefill and chunk_kv is not None and logit_softcap is None \
                and window_size is None and T >= 128:
            # Note on the tunneled TPU CI stack: its remote compile/execute
            # service intermittently wedges on LARGE programs (identical
            # programs complete in seconds during healthy windows and hang in
            # _pjit_lower or post-dispatch during degraded ones).  The kernels
            # themselves pass all tests.  Escape hatches for degraded stacks:
            # LMDEPLOY_TPU_DISABLE_FLASH=1 (gather path) or
            # LMDEPLOY_TPU_DENSE_PREFILL=1 (q-tiled dense XLA path).
            if os.environ.get('LMDEPLOY_TPU_DISABLE_FLASH') == '1':
                pass
            elif os.environ.get('LMDEPLOY_TPU_DENSE_PREFILL') == '1':
                return _dense_prefill(q, chunk_kv[0], chunk_kv[1], scale)
            else:
                return _flash_prefill(q, chunk_kv[0], chunk_kv[1], scale)
    k, v = gather_layer_kv(kv_cache, layer, block_tables, num_kv_heads, D)
    return attention_dense_gathered(q, k, v, history_lens, scale,
                                    logit_softcap, window_size, sinks)


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
