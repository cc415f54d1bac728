"""Fused W4A16 dequant + matmul Pallas kernel (AWQ/GPTQ serving path).

Reference analog: the CUDA W4A16 fused dequant-GEMM in ``src/turbomind/kernels/gemm/``
(gemm_universal, convert kernels) and ``lmdeploy/pytorch/kernels/cuda/awq_kernels.py``.

TPU design (round-2 rework — the round-1 schedule lost to its own fallback):
  * Storage layout is OURS, not AWQ's ("half-split" packing): byte (r, n) of
    ``packed u8[K/2, N]`` holds the weight for input row ``r`` in its low
    nibble and input row ``K/2 + r`` in its high nibble.  Unlike the usual
    even/odd interleave this makes the two activation halves *contiguous*
    slices (``x[:, :K/2]`` / ``x[:, K/2:]``) — no strided re-gather per call —
    and keeps quant-group boundaries aligned in packed-row space.
  * Decode GEMMs are weight-bandwidth-bound: reading 4 bits/weight instead of
    16 is the entire win (reference reports 2.4x, w4a16.md:119).  The kernel
    streams large packed tiles HBM->VMEM through the standard Pallas pipeline
    (auto double-buffered), unpacks nibbles with two VPU ops per byte, and
    feeds the MXU in bf16.
  * Scales are applied to the *dot output* per quant group (8 small-k dots per
    tile instead of one big dot) so the per-weight VPU work is just
    mask/shift + u8->bf16 convert — the f32 multiply happens on the [B, bn]
    accumulator, gs times fewer elements.
  * Zero points never enter the kernel: (q - z)·s = q·s − z·s, and the
    ``x @ (z·s)`` correction collapses to per-group activation sums times a
    precomputed [G, N] table — a tiny XLA GEMM fused outside.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _w4a16_kernel(x_lo_ref, x_hi_ref, packed_ref, s_lo_ref, s_hi_ref,
                  out_ref, acc_ref, *, groups_per_tile: int, group_rows: int,
                  out_dtype):
    """One (n, k) grid step: acc += Σ_half Σ_group (x_g @ q_g) * s_g."""
    k_idx = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    packed = packed_ref[...]                     # [bk2, bn] u8
    # Mosaic legalizes neither u8 float casts nor u8 shrui: widen to i32
    # first, then mask/shift/convert (values 0..15 are exact everywhere)
    p32 = packed.astype(jnp.int32)
    q_lo = (p32 & 0xF).astype(jnp.bfloat16)
    q_hi = ((p32 >> 4) & 0xF).astype(jnp.bfloat16)

    # the scale refs carry ALL groups of their half (sublane-dim blocks thinner
    # than 8 can't be tiled); pick this k-tile's rows dynamically
    g_base = k_idx * groups_per_tile
    acc = acc_ref[...]
    for q, x_ref, s_ref in ((q_lo, x_lo_ref, s_lo_ref),
                            (q_hi, x_hi_ref, s_hi_ref)):
        for g in range(groups_per_tile):
            r0 = g * group_rows
            part = jnp.dot(x_ref[:, r0:r0 + group_rows],
                           q[r0:r0 + group_rows],
                           preferred_element_type=jnp.float32)
            acc = acc + part * s_ref[pl.ds(g_base + g, 1), :]
    acc_ref[...] = acc

    @pl.when(k_idx == nk - 1)
    def _():
        out_ref[...] = acc_ref[...].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=('group_size', 'block_n', 'block_k2'))
def w4a16_matmul(x: jax.Array,            # [B, K] bf16/f32
                 packed: jax.Array,       # [K/2, N] u8 (half-split packing)
                 scales: jax.Array,       # [K/gs, N] f32
                 zeros: jax.Array,        # [K/gs, N] f32
                 group_size: int = 128,
                 block_n: int = 512,
                 block_k2: int = 512) -> jax.Array:
    B, K = x.shape
    K2, N = packed.shape
    assert K2 * 2 == K, (K2, K)
    G = K // group_size
    assert scales.shape == (G, N) and zeros.shape == (G, N)
    assert K2 % group_size == 0, 'need group_size | K/2 for half-split packing'

    block_n = min(block_n, N)
    while N % block_n:
        block_n //= 2
    block_k2 = min(block_k2, K2)
    while K2 % block_k2 or block_k2 % group_size:
        block_k2 //= 2
    assert block_k2 >= group_size, (block_k2, group_size)
    groups_per_tile = block_k2 // group_size

    xb = x.astype(jnp.bfloat16)
    x_lo = xb[:, :K2]
    x_hi = xb[:, K2:]
    s = scales.astype(jnp.float32)
    s_lo, s_hi = s[:G // 2], s[G // 2:]

    grid = (N // block_n, K2 // block_k2)
    kernel = functools.partial(
        _w4a16_kernel, groups_per_tile=groups_per_tile,
        group_rows=group_size, out_dtype=x.dtype)
    y = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, block_k2), lambda n, k: (0, k)),
            pl.BlockSpec((B, block_k2), lambda n, k: (0, k)),
            pl.BlockSpec((block_k2, block_n), lambda n, k: (k, n)),
            pl.BlockSpec((G // 2, block_n), lambda n, k: (0, n)),
            pl.BlockSpec((G // 2, block_n), lambda n, k: (0, n)),
        ],
        out_specs=pl.BlockSpec((B, block_n), lambda n, k: (0, n)),
        out_shape=jax.ShapeDtypeStruct((B, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((B, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'arbitrary')),
    )(x_lo, x_hi, packed, s_lo, s_hi)

    # zero-point correction: x @ (z*s) = (per-group x sums) @ (z*s)
    xg = x.astype(jnp.float32).reshape(B, G, group_size).sum(-1)   # [B, G]
    corr = jnp.dot(xg, (zeros * s), preferred_element_type=jnp.float32)
    return (y.astype(jnp.float32) - corr).astype(x.dtype)


def w4a16_matmul_reference(x, packed, scales, zeros, group_size: int = 128):
    """jnp dequant + dense matmul: the compute-bound (prefill) path and the
    correctness reference for the fused kernel."""
    K2, N = packed.shape
    K = K2 * 2
    lo = (packed & 0xF).astype(jnp.float32)
    hi = (packed >> 4).astype(jnp.float32)
    q = jnp.concatenate([lo, hi], axis=0)               # half-split layout
    s = jnp.repeat(scales, group_size, axis=0)
    z = jnp.repeat(zeros, group_size, axis=0)
    w = ((q - z) * s).astype(jnp.bfloat16)
    return jnp.dot(x.astype(jnp.bfloat16), w,
                   preferred_element_type=jnp.float32).astype(x.dtype)


def pack_w4(w_q: jax.Array) -> jax.Array:
    """Pack int4 values (0..15) [K, N] -> u8[K/2, N] half-split layout
    (low nibble = row r, high nibble = row K/2 + r)."""
    w_q = jnp.asarray(w_q, jnp.uint8)
    K = w_q.shape[0]
    lo = w_q[:K // 2]
    hi = w_q[K // 2:]
    return (lo | (hi << 4)).astype(jnp.uint8)


def quantize_w4(w: jax.Array, group_size: int = 128):
    """Group-wise asymmetric 4-bit quantization of a dense [K, N] weight.

    Returns (packed u8[K/2,N], scales f32[K/gs,N], zeros f32[K/gs,N]) in the
    layout w4a16_matmul expects.  Matches AWQ's asymmetric min/max scheme
    (reference: lmdeploy/lite/quantization/awq.py quant_weights).
    """
    K, N = w.shape
    g = K // group_size
    wg = w.reshape(g, group_size, N).astype(jnp.float32)
    w_min = wg.min(axis=1)
    w_max = wg.max(axis=1)
    scales = (w_max - w_min) / 15.0
    scales = jnp.where(scales == 0, 1.0, scales)
    zeros = -w_min / scales                              # f32 zero-points
    q = jnp.clip(jnp.round(wg / scales[:, None] + zeros[:, None]), 0, 15)
    q = q.reshape(K, N).astype(jnp.uint8)
    return pack_w4(q), scales, zeros
