"""Paged-attention decode kernel (T=1) in Pallas.

Reference analog: TurboMind's split-K flash decoding (``src/turbomind/kernels/
attention/decoding.cu``, block iteration ``block_iterator.h``) and the Triton
``_fwd_grouped_split_kernel`` (``lmdeploy/pytorch/kernels/cuda/pagedattention.py:48``).

TPU design (not a translation):
  * Cache layout is kv-head-major ``[Hkv, NB, BS, D]`` so one page for one kv head is
    a contiguous ``[BS, D]`` region — a single efficient DMA.
  * Grid = (B, Hkv).  Block tables + kv lengths arrive via scalar prefetch (SMEM) so
    page DMAs can be issued ahead of compute; K and V pages are double-buffered in
    VMEM (the TPU analog of cp.async pipelines in ``mainloop_sm80.h``).
  * GQA without materialization: the q block for one kv head is its [G, D] group;
    scores [G, chunk] hit the MXU; online-softmax state (m, l, acc) lives in VMEM f32.
  * Each (b, h) program is independent — the split-K reduction of the CUDA kernel is
    unnecessary because pages stream through VMEM at full HBM bandwidth and the op is
    bandwidth-bound at decode arithmetic intensity.

The dequant hook (KV int8/fp8, reference ``kernels/attention/quantization.h``) lands
in this kernel: pages are dequantized in VMEM right after DMA, before the matmul.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _decode_kernel(
    # scalar prefetch
    lengths_ref,        # [B] i32 (SMEM)
    tables_ref,         # [B, W] i32 (SMEM)
    layer_ref,          # [1] i32 (SMEM) — which layer's cache region to read
    # inputs
    q_ref,              # [G, D] VMEM (this (b, h) program's query group)
    k_pages_ref,        # [L, Hkv, NB, BS, D] HBM (full cache, manual DMA)
    v_pages_ref,        # [L, Hkv, NB, BS, D] HBM
    # output
    out_ref,            # [G, D] VMEM
    # scratch
    k_buf, v_buf,       # [2, PAGES_PER_BLK, BS, D] VMEM
    sems,               # DMA sems [2, 2]
    acc_ref,            # [G, D] f32 VMEM
    *, block_size: int, pages_per_blk: int, scale: float,
    logit_softcap: Optional[float],
):
    b = pl.program_id(0)
    h = pl.program_id(1)
    layer = layer_ref[0]
    length = lengths_ref[b]
    chunk = block_size * pages_per_blk
    num_chunks = pl.cdiv(length, chunk)
    W = tables_ref.shape[1]
    G, D = q_ref.shape

    def start_copy(chunk_idx, slot):
        for p in range(pages_per_blk):
            page_pos = chunk_idx * pages_per_blk + p
            page_idx = tables_ref[b, jnp.minimum(page_pos, W - 1)]
            pltpu.make_async_copy(
                k_pages_ref.at[layer, h, page_idx], k_buf.at[slot, p],
                sems.at[slot, 0]).start()
            pltpu.make_async_copy(
                v_pages_ref.at[layer, h, page_idx], v_buf.at[slot, p],
                sems.at[slot, 1]).start()

    def wait_copy(slot):
        # one wait sized to the whole slot covers all pages_per_blk page DMAs
        pltpu.make_async_copy(k_buf.at[slot], k_buf.at[slot], sems.at[slot, 0]).wait()
        pltpu.make_async_copy(v_buf.at[slot], v_buf.at[slot], sems.at[slot, 1]).wait()

    @pl.when(num_chunks > 0)
    def _():
        start_copy(0, 0)

    q = q_ref[...].astype(jnp.float32) * scale          # [G, D]
    acc_ref[...] = jnp.zeros_like(acc_ref)

    def body(c, carry):
        m_prev, l_prev = carry                          # [G, 1] each
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < num_chunks)
        def _():
            start_copy(c + 1, 1 - slot)

        wait_copy(slot)
        k = k_buf[slot].reshape(chunk, D).astype(jnp.float32)     # [chunk, D]
        v = v_buf[slot].reshape(chunk, D).astype(jnp.float32)

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)   # [G, chunk]
        if logit_softcap is not None:
            s = jnp.tanh(s / logit_softcap) * logit_softcap
        pos = c * chunk + jax.lax.broadcasted_iota(jnp.int32, (G, chunk), 1)
        s = jnp.where(pos < length, s, MASK_VALUE)

        m_cur = jnp.max(s, axis=1, keepdims=True)                 # [G, 1]
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)                                    # [G, chunk]
        alpha = jnp.exp(m_prev - m_new)                           # [G, 1]
        l_new = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return m_new, l_new

    init = (jnp.full((G, 1), MASK_VALUE, jnp.float32),
            jnp.zeros((G, 1), jnp.float32))
    _, l = jax.lax.fori_loop(0, num_chunks, body, init)

    out_ref[...] = (acc_ref[...] / jnp.where(l == 0.0, 1.0, l)).astype(out_ref.dtype)


def _decode_kernel_quant(
    # scalar prefetch
    lengths_ref, tables_ref, layer_ref,
    # inputs
    q_ref,              # [G, D] VMEM
    k_pages_ref,        # [L, Hkv, NB, BS, D] HBM int8
    v_pages_ref,        # [L, Hkv, NB, BS, D] HBM int8
    k_scale_ref,        # [L, Hkv, NB, BS] HBM f32 per-token scales
    v_scale_ref,        # [L, Hkv, NB, BS] HBM f32
    # output
    out_ref,            # [G, D] VMEM
    # scratch
    k_buf, v_buf,       # [2, BS, D] VMEM int8
    ksc_buf, vsc_buf,   # [2, BS] VMEM f32
    sems,               # DMA sems [2, 4]
    acc_ref,            # [G, D] f32
    *, block_size: int, scale: float, logit_softcap: Optional[float],
):
    """Quantized-KV decode: pages stream as int8 at half the HBM bytes of bf16;
    per-token scales ride along (512B per 16KB page) and dequantization happens
    on the score/probability side — ``s = (q·k_q) * k_sc`` and
    ``out += (p * v_sc) @ v_q`` — so no [BS, D] lane-broadcast of scales is
    ever materialized.  Reference: quantization.h dequant-on-load + the
    promised "decode-kernel scale DMA" (r1 deferred).
    """
    b = pl.program_id(0)
    h = pl.program_id(1)
    layer = layer_ref[0]
    length = lengths_ref[b]
    num_pages = pl.cdiv(length, block_size)
    W = tables_ref.shape[1]
    G, D = q_ref.shape
    BS = block_size

    def start_copy(page_pos, slot):
        page_idx = tables_ref[b, jnp.minimum(page_pos, W - 1)]
        pltpu.make_async_copy(k_pages_ref.at[layer, h, page_idx],
                              k_buf.at[slot], sems.at[slot, 0]).start()
        pltpu.make_async_copy(v_pages_ref.at[layer, h, page_idx],
                              v_buf.at[slot], sems.at[slot, 1]).start()
        pltpu.make_async_copy(k_scale_ref.at[layer, h, page_idx],
                              ksc_buf.at[slot], sems.at[slot, 2]).start()
        pltpu.make_async_copy(v_scale_ref.at[layer, h, page_idx],
                              vsc_buf.at[slot], sems.at[slot, 3]).start()

    def wait_copy(slot):
        pltpu.make_async_copy(k_buf.at[slot], k_buf.at[slot],
                              sems.at[slot, 0]).wait()
        pltpu.make_async_copy(v_buf.at[slot], v_buf.at[slot],
                              sems.at[slot, 1]).wait()
        pltpu.make_async_copy(ksc_buf.at[slot], ksc_buf.at[slot],
                              sems.at[slot, 2]).wait()
        pltpu.make_async_copy(vsc_buf.at[slot], vsc_buf.at[slot],
                              sems.at[slot, 3]).wait()

    @pl.when(num_pages > 0)
    def _():
        start_copy(0, 0)

    q = q_ref[...].astype(jnp.float32) * scale          # [G, D]
    acc_ref[...] = jnp.zeros_like(acc_ref)

    def body(c, carry):
        m_prev, l_prev = carry
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < num_pages)
        def _():
            start_copy(c + 1, 1 - slot)

        wait_copy(slot)
        k = k_buf[slot].astype(jnp.float32)             # [BS, D]
        v = v_buf[slot].astype(jnp.float32)
        ksc = ksc_buf[slot].reshape(1, BS)              # [1, BS]
        vsc = vsc_buf[slot].reshape(1, BS)

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)   # [G, BS]
        s = s * ksc
        if logit_softcap is not None:
            s = jnp.tanh(s / logit_softcap) * logit_softcap
        pos = c * BS + jax.lax.broadcasted_iota(jnp.int32, (G, BS), 1)
        s = jnp.where(pos < length, s, MASK_VALUE)

        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            p * vsc, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new

    init = (jnp.full((G, 1), MASK_VALUE, jnp.float32),
            jnp.zeros((G, 1), jnp.float32))
    _, l = jax.lax.fori_loop(0, num_pages, body, init)

    out_ref[...] = (acc_ref[...] / jnp.where(l == 0.0, 1.0, l)).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=('scale', 'logit_softcap'))
def paged_decode_attention_quant(
    q: jax.Array,              # [B, Hq, D]
    k_cache,                   # QuantKV: int8 [L,Hkv,NB,BS,Dp] + f32 [L,Hkv,NB,BS]
    v_cache,
    block_tables: jax.Array,   # [B, W] i32
    kv_lens: jax.Array,        # [B] i32
    layer,
    scale: float,
    logit_softcap: Optional[float] = None,
) -> jax.Array:
    B, Hq, D = q.shape
    _, Hkv, NB, BS, Dp = k_cache.data.shape
    G = Hq // Hkv
    layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)

    q_grouped = q.reshape(B, Hkv, G, D)
    if Dp != D:
        q_grouped = jnp.pad(q_grouped, ((0, 0), (0, 0), (0, 0), (0, Dp - D)))

    kernel = functools.partial(_decode_kernel_quant, block_size=BS, scale=scale,
                               logit_softcap=logit_softcap)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(B, Hkv),
            in_specs=[
                pl.BlockSpec((None, None, G, Dp), lambda b, h, *_: (b, h, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec((None, None, G, Dp),
                                   lambda b, h, *_: (b, h, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, BS, Dp), k_cache.data.dtype),
                pltpu.VMEM((2, BS, Dp), v_cache.data.dtype),
                pltpu.VMEM((2, BS), jnp.float32),
                pltpu.VMEM((2, BS), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 4)),
                pltpu.VMEM((G, Dp), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, Dp), q.dtype),
    )(kv_lens, block_tables, layer_arr, q_grouped,
      k_cache.data, v_cache.data, k_cache.scale, v_cache.scale)

    return out[..., :D].reshape(B, Hq, D)


def _decode_kernel_quant4(
    lengths_ref, tables_ref, layer_ref,
    q_ref,                  # [G, D] VMEM
    k_pages_ref,            # [L, Hkv, NB, BS/2, D] HBM u8 (token-pair packed)
    v_pages_ref,
    k_scale_ref,            # [L, Hkv, NB, BS] HBM f32 (de-interleaved order)
    k_minv_ref,
    v_scale_ref,
    v_minv_ref,
    out_ref,
    k_buf, v_buf,           # [2, BS/2, D] VMEM u8
    ksc_buf, kmn_buf, vsc_buf, vmn_buf,   # [2, BS] VMEM f32
    sems,                   # [2, 6]
    acc_ref,                # [G, D] f32
    *, block_size: int, scale: float, logit_softcap: Optional[float],
):
    """int4-KV decode: 4-bit pages stream at a quarter of bf16 bytes.  Nibbles
    hold token pairs; unpacked halves are concatenated along sublanes into
    de-interleaved token order ([even | odd]) which matches the stored scale
    vectors, so dequantization is pure score-side math:
    ``s = (q·k_q)·k_sc + (Σq)·k_min`` and
    ``out += (p·v_sc) @ v_q + (p·v_min)·1``.
    """
    b = pl.program_id(0)
    h = pl.program_id(1)
    layer = layer_ref[0]
    length = lengths_ref[b]
    num_pages = pl.cdiv(length, block_size)
    W = tables_ref.shape[1]
    G, D = q_ref.shape
    BS = block_size
    BS2 = BS // 2

    def start_copy(page_pos, slot):
        page_idx = tables_ref[b, jnp.minimum(page_pos, W - 1)]
        pltpu.make_async_copy(k_pages_ref.at[layer, h, page_idx],
                              k_buf.at[slot], sems.at[slot, 0]).start()
        pltpu.make_async_copy(v_pages_ref.at[layer, h, page_idx],
                              v_buf.at[slot], sems.at[slot, 1]).start()
        pltpu.make_async_copy(k_scale_ref.at[layer, h, page_idx],
                              ksc_buf.at[slot], sems.at[slot, 2]).start()
        pltpu.make_async_copy(k_minv_ref.at[layer, h, page_idx],
                              kmn_buf.at[slot], sems.at[slot, 3]).start()
        pltpu.make_async_copy(v_scale_ref.at[layer, h, page_idx],
                              vsc_buf.at[slot], sems.at[slot, 4]).start()
        pltpu.make_async_copy(v_minv_ref.at[layer, h, page_idx],
                              vmn_buf.at[slot], sems.at[slot, 5]).start()

    def wait_copy(slot):
        for i, buf in enumerate((k_buf, v_buf, ksc_buf, kmn_buf, vsc_buf,
                                 vmn_buf)):
            pltpu.make_async_copy(buf.at[slot], buf.at[slot],
                                  sems.at[slot, i]).wait()

    @pl.when(num_pages > 0)
    def _():
        start_copy(0, 0)

    q = q_ref[...].astype(jnp.float32) * scale          # [G, D]
    qsum = jnp.sum(q, axis=1, keepdims=True)            # [G, 1] (for min term)
    acc_ref[...] = jnp.zeros_like(acc_ref)

    def body(c, carry):
        m_prev, l_prev = carry
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < num_pages)
        def _():
            start_copy(c + 1, 1 - slot)

        wait_copy(slot)
        kp = k_buf[slot].astype(jnp.int32)              # [BS2, D]
        vp = v_buf[slot].astype(jnp.int32)
        k_q = jnp.concatenate([kp & 0xF, (kp >> 4) & 0xF],
                              axis=0).astype(jnp.float32)        # [BS, D]
        v_q = jnp.concatenate([vp & 0xF, (vp >> 4) & 0xF],
                              axis=0).astype(jnp.float32)
        ksc = ksc_buf[slot].reshape(1, BS)
        kmn = kmn_buf[slot].reshape(1, BS)
        vsc = vsc_buf[slot].reshape(1, BS)
        vmn = vmn_buf[slot].reshape(1, BS)

        s = jax.lax.dot_general(q, k_q, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)   # [G, BS]
        s = s * ksc + qsum * kmn
        if logit_softcap is not None:
            s = jnp.tanh(s / logit_softcap) * logit_softcap
        # column j holds token slot 2j (j < BS2) or 2(j-BS2)+1
        j = jax.lax.broadcasted_iota(jnp.int32, (G, BS), 1)
        tok = jnp.where(j < BS2, 2 * j, 2 * j - BS + 1)
        pos = c * BS + tok
        s = jnp.where(pos < length, s, MASK_VALUE)

        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(p * vsc, v_q, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        p_mn = jnp.sum(p * vmn, axis=1, keepdims=True)           # [G, 1]
        acc_ref[...] = acc_ref[...] * alpha + pv + p_mn
        return m_new, l_new

    init = (jnp.full((G, 1), MASK_VALUE, jnp.float32),
            jnp.zeros((G, 1), jnp.float32))
    _, l = jax.lax.fori_loop(0, num_pages, body, init)

    out_ref[...] = (acc_ref[...] / jnp.where(l == 0.0, 1.0, l)).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=('scale', 'logit_softcap'))
def paged_decode_attention_quant4(
    q: jax.Array,              # [B, Hq, D]
    k_cache,                   # QuantKV4
    v_cache,
    block_tables: jax.Array,
    kv_lens: jax.Array,
    layer,
    scale: float,
    logit_softcap: Optional[float] = None,
) -> jax.Array:
    B, Hq, D = q.shape
    _, Hkv, NB, BS2, Dp = k_cache.data.shape
    BS = BS2 * 2
    G = Hq // Hkv
    layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)

    q_grouped = q.reshape(B, Hkv, G, D)
    if Dp != D:
        q_grouped = jnp.pad(q_grouped, ((0, 0), (0, 0), (0, 0), (0, Dp - D)))

    kernel = functools.partial(_decode_kernel_quant4, block_size=BS,
                               scale=scale, logit_softcap=logit_softcap)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(B, Hkv),
            in_specs=[
                pl.BlockSpec((None, None, G, Dp), lambda b, h, *_: (b, h, 0, 0)),
            ] + [pl.BlockSpec(memory_space=pltpu.HBM)] * 6,
            out_specs=pl.BlockSpec((None, None, G, Dp),
                                   lambda b, h, *_: (b, h, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, BS2, Dp), jnp.uint8),
                pltpu.VMEM((2, BS2, Dp), jnp.uint8),
                pltpu.VMEM((2, BS), jnp.float32),
                pltpu.VMEM((2, BS), jnp.float32),
                pltpu.VMEM((2, BS), jnp.float32),
                pltpu.VMEM((2, BS), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 6)),
                pltpu.VMEM((G, Dp), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, Dp), q.dtype),
    )(kv_lens, block_tables, layer_arr, q_grouped,
      k_cache.data, v_cache.data, k_cache.scale, k_cache.minv,
      v_cache.scale, v_cache.minv)

    return out[..., :D].reshape(B, Hq, D)


@functools.partial(jax.jit, static_argnames=('scale', 'logit_softcap',
                                             'pages_per_blk'))
def paged_decode_attention(
    q: jax.Array,              # [B, Hq, D]
    k_cache: jax.Array,        # [L, Hkv, NB, BS, D] (full cache)
    v_cache: jax.Array,        # [L, Hkv, NB, BS, D]
    block_tables: jax.Array,   # [B, W] i32
    kv_lens: jax.Array,        # [B] i32 — valid kv length per row (0 = inactive)
    layer,                     # scalar i32 — layer region to read
    scale: float,
    logit_softcap: Optional[float] = None,
    pages_per_blk: int = 2,
) -> jax.Array:
    B, Hq, D = q.shape
    _, Hkv, NB, BS, Dp = k_cache.shape
    G = Hq // Hkv
    W = block_tables.shape[1]
    pages_per_blk = min(pages_per_blk, W)
    layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)

    # [B, Hq, D] -> [B, Hkv, G, D]: q heads h*G..h*G+G-1 share kv head h (head-major
    # grouping, matching the column-parallel weight layout).  The cache head_dim may
    # be lane-padded (Dp >= D); zero-pad q to match — zeros add nothing to scores,
    # and the padded out lanes are sliced away below.
    q_grouped = q.reshape(B, Hkv, G, D)
    if Dp != D:
        q_grouped = jnp.pad(q_grouped, ((0, 0), (0, 0), (0, 0), (0, Dp - D)))

    kernel = functools.partial(
        _decode_kernel, block_size=BS, pages_per_blk=pages_per_blk, scale=scale,
        logit_softcap=logit_softcap)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(B, Hkv),
            in_specs=[
                pl.BlockSpec((None, None, G, Dp), lambda b, h, *_: (b, h, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec((None, None, G, Dp), lambda b, h, *_: (b, h, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, pages_per_blk, BS, Dp), k_cache.dtype),
                pltpu.VMEM((2, pages_per_blk, BS, Dp), v_cache.dtype),
                pltpu.SemaphoreType.DMA((2, 2)),
                pltpu.VMEM((G, Dp), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, Dp), q.dtype),
    )(kv_lens, block_tables, layer_arr, q_grouped, k_cache, v_cache)

    return out[..., :D].reshape(B, Hq, D)
