"""Dense causal flash-attention kernel for fresh prefill chunks.

Reference analog: TurboMind's prefill attention (``src/turbomind/kernels/attention/
attention.cu``).  Used for history-free prefill where the chunk's own K/V are dense
tensors — no paging, no gather.  (The jax-bundled flash kernel intermittently hangs
on this TPU stack, so the framework carries its own.)

Design: grid (B*Hkv, q_tiles, kv_tiles) with kv innermost; K/V tiles stream through
the standard Pallas pipeline (auto double-buffered); online-softmax state in VMEM
scratch persists across the kv dimension; causal upper-triangle tiles are skipped
wholesale.  GQA: one program handles a [G*TQ, D] query group block against the
kv head's [TK, D] tiles.
"""
from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _flash_kernel(q_ref, k_ref, v_ref, out_ref, acc_ref, m_ref, l_ref,
                  *, tile_q: int, tile_k: int, scale: float, num_kv: int):
    j = pl.program_id(2)
    i = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, MASK_VALUE)
        l_ref[...] = jnp.zeros_like(l_ref)

    # causal tile skip: kv tile j only contributes when j*TK <= (i+1)*TQ - 1
    @pl.when(j * tile_k < (i + 1) * tile_q)
    def _():
        q = q_ref[0, 0].astype(jnp.float32) * scale       # [G*TQ, D]
        k = k_ref[0].astype(jnp.float32)                  # [TK, D]
        v = v_ref[0].astype(jnp.float32)
        GT, D = q.shape
        G = GT // tile_q

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # [G*TQ, TK]
        # positions: query row r (within tile) is absolute i*TQ + (r % TQ)
        rows = jax.lax.broadcasted_iota(jnp.int32, (GT, tile_k), 0) % tile_q
        q_pos = i * tile_q + rows
        k_pos = j * tile_k + jax.lax.broadcasted_iota(jnp.int32, (GT, tile_k), 1)
        s = jnp.where(k_pos <= q_pos, s, MASK_VALUE)

        m_prev = m_ref[:, :1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_ref[...] = jnp.broadcast_to(
            alpha * l_ref[:, :1] + jnp.sum(p, axis=1, keepdims=True), l_ref.shape)
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)

    @pl.when(j == num_kv - 1)
    def _():
        l = l_ref[:, :1]
        out_ref[0, 0] = (acc_ref[...] / jnp.where(l == 0.0, 1.0, l)
                         ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=('scale', 'tile_q', 'tile_k'))
def flash_prefill_attention(q: jax.Array,      # [B, T, Hq, D]
                            k: jax.Array,      # [B, T, Hkv, D]
                            v: jax.Array,      # [B, T, Hkv, D]
                            scale: float,
                            tile_q: int = 128,
                            tile_k: int = 128) -> jax.Array:
    B, T, Hq, D = q.shape
    Hkv = k.shape[2]
    G = Hq // Hkv
    tile_q = min(tile_q, T)
    tile_k = min(tile_k, T)
    assert T % tile_q == 0 and T % tile_k == 0
    nq, nk = T // tile_q, T // tile_k

    # [B, T, Hkv, G, D] -> [B*Hkv, nq, G*TQ, D] grouped-query tiles: program (b*h, i)
    # sees G query rows per position stacked G-major so rows r%TQ share a position
    qg = q.reshape(B, T, Hkv, G, D).transpose(0, 2, 3, 1, 4)   # [B, Hkv, G, T, D]
    qg = qg.reshape(B * Hkv, G, T, D).transpose(0, 2, 1, 3)    # [BH, T, G, D]
    qg = qg.reshape(B * Hkv, nq, tile_q, G, D).transpose(0, 1, 3, 2, 4)
    qg = qg.reshape(B * Hkv, nq, G * tile_q, D)

    kh = k.transpose(0, 2, 1, 3).reshape(B * Hkv, T, D)
    vh = v.transpose(0, 2, 1, 3).reshape(B * Hkv, T, D)

    kernel = functools.partial(_flash_kernel, tile_q=tile_q, tile_k=tile_k,
                               scale=scale, num_kv=nk)
    out = pl.pallas_call(
        kernel,
        grid=(B * Hkv, nq, nk),
        in_specs=[
            pl.BlockSpec((1, 1, G * tile_q, D), lambda b, i, j: (b, i, 0, 0)),
            pl.BlockSpec((1, tile_k, D), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, tile_k, D), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, G * tile_q, D), lambda b, i, j: (b, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B * Hkv, nq, G * tile_q, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((G * tile_q, D), jnp.float32),
            pltpu.VMEM((G * tile_q, 128), jnp.float32),
            pltpu.VMEM((G * tile_q, 128), jnp.float32),
        ],
        # NB: 'parallel' grid semantics inside a lax.scan wedge this TPU stack
        # (device-side hang); 'arbitrary' is sequential-correct and costs nothing
        # on a single-core chip.
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary', 'arbitrary')),
    )(qg, kh, vh)

    # invert the grouped-tile layout back to [B, T, Hq, D]
    out = out.reshape(B * Hkv, nq, G, tile_q, D).transpose(0, 1, 3, 2, 4)
    out = out.reshape(B * Hkv, T, G, D).transpose(0, 2, 1, 3)  # [BH, G, T, D]
    out = out.reshape(B, Hkv, G, T, D).transpose(0, 3, 1, 2, 4)
    return out.reshape(B, T, Hq, D)
