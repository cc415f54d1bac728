"""Fused W4A16 dequant + matmul Pallas kernel (AWQ/GPTQ serving path).

Reference analog: the CUDA W4A16 fused dequant-GEMM in ``src/turbomind/kernels/gemm/``
(gemm_universal, convert kernels) and ``lmdeploy/pytorch/kernels/cuda/awq_kernels.py``.

TPU design (round-2; measured on v5e with slope-timed chains, see
``benchmark/bench_w4a16_kernel.py``):
  * Storage layout is OURS, not AWQ's ("half-split" packing): byte (r, n) of
    ``packed u8[K/2, N]`` holds the weight for input row ``r`` in its low
    nibble and input row ``K/2 + r`` in its high nibble.  Unlike the usual
    even/odd interleave this makes the two activation halves *contiguous*
    slices (``x[:, :K/2]`` / ``x[:, K/2:]``) — no strided re-gather per call —
    and keeps quant-group boundaries aligned in packed-row space.
  * Decode GEMMs are weight-bandwidth-bound: reading 4 bits/weight instead of
    16 is the entire win (reference reports 2.4x, w4a16.md:119).  Measured
    here: 1.5-2.1x vs dense bf16 at M<=128 and 5-18x vs dequant+dense, which
    round-trips a full bf16 weight through HBM and is never worth it on TPU.
  * Unpack is 4 VPU ops/byte (zero-extend to i32, mask, shift, 2 converts;
    u8/u4 -> bf16 casts are not legalized by Mosaic, so i32 widening is the
    only path).  That puts the kernel at ~350-400 GB/s of effective packed
    bandwidth — VPU-bound, not DMA-bound, but still well past dense.
  * Two compute modes by token count M (chosen statically per jit bucket):
    - M <= GROUP_DOT_MAX_M ("group-dot", decode): scales hit the *dot output*
      per quant group (8 small-k dots per tile), so per-weight VPU work is
      just the unpack.  Scale cost is O(M*N*G) on the f32 accumulator —
      negligible at decode M, dominant at prefill M.
    - M > GROUP_DOT_MAX_M ("pre-scale", prefill): the unpacked tile is
      multiplied by its per-group scale (one op per weight, O(K*N))
      and fed to ONE dot per (m,n,k) tile — the MXU-bound regime at the
      same HBM traffic as decode.  Measured 0.67-0.75x dense bf16 at
      B=512-2048 (the dequant VPU work doesn't fully pipeline behind the
      MXU) but 2.8x the dequant+dense fallback; prefill compute is a
      small share of mixed serving, and W4's capacity win is the point.
  * Zero points never enter the kernel: (q - z)*s = q*s - z*s, and the
    ``x @ (z*s)`` correction collapses to per-group activation sums times a
    precomputed [G, N] table — a tiny XLA GEMM fused outside.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# token count at/below which the per-group-dot schedule beats pre-scale
# (measured crossover on v5e: group-dot wins to ~256, pre-scale from ~512)
GROUP_DOT_MAX_M = 256


def _unpack_tile(packed, dtype=jnp.bfloat16):
    """u8 [bk2, bn] -> (lo, hi) nibble planes.  Mosaic legalizes neither
    u8 float casts nor u8 shrui: widen to i32 (zero-extend) first."""
    p32 = packed.astype(jnp.int32)
    q_lo = (p32 & 0xF).astype(dtype)
    q_hi = (p32 >> 4).astype(dtype)          # no mask needed after zext
    return q_lo, q_hi


def _w4a16_kernel_groupdot(x_lo_ref, x_hi_ref, packed_ref, s_lo_ref, s_hi_ref,
                           out_ref, acc_ref, w_ref, *, groups_per_tile: int,
                           group_rows: int, out_dtype):
    """One (m, n, k) grid step: acc += sum_half sum_group (x_g @ q_g) * s_g."""
    k_idx = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q_lo, q_hi = _unpack_tile(packed_ref[...])
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


def _w4a16_kernel_prescale(x_lo_ref, x_hi_ref, packed_ref, s_lo_ref, s_hi_ref,
                           out_ref, acc_ref, w_ref, *, groups_per_tile: int,
                           group_rows: int, out_dtype):
    """One (m, n, k) grid step, MXU regime: scale the unpacked tile per
    group (1 op/weight) into a bf16 scratch, then a single wide dot per
    half.  Group rows are scaled slice-by-slice ([1, bn] broadcast over
    [group_rows, bn]) — sublane-expanding broadcasts don't lower in Mosaic."""
    k_idx = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # f32 planes: the scale multiply must happen in f32 with a single final
    # rounding to bf16, or the kernel's effective scale diverges from the f32
    # zero-point correction applied outside (bf16(s) vs s skew ~0.4% * z)
    q_lo, q_hi = _unpack_tile(packed_ref[...], jnp.float32)
    g_base = k_idx * groups_per_tile
    acc = acc_ref[...]
    for q, x_ref, s_ref in ((q_lo, x_lo_ref, s_lo_ref),
                            (q_hi, x_hi_ref, s_hi_ref)):
        for g in range(groups_per_tile):
            r0 = g * group_rows
            s_row = s_ref[pl.ds(g_base + g, 1), :]             # [1, bn] f32
            w_ref[r0:r0 + group_rows, :] = (
                q[r0:r0 + group_rows] * s_row).astype(jnp.bfloat16)
        acc = acc + jnp.dot(x_ref[...], w_ref[...],
                            preferred_element_type=jnp.float32)
    acc_ref[...] = acc

    @pl.when(k_idx == nk - 1)
    def _():
        out_ref[...] = acc_ref[...].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=('group_size', 'block_m',
                                             'block_n', 'block_k2'))
def w4a16_matmul(x: jax.Array,            # [B, K] bf16/f32
                 packed: jax.Array,       # [K/2, N] u8 (half-split packing)
                 scales: jax.Array,       # [K/gs, N] f32
                 zeros: jax.Array,        # [K/gs, N] f32
                 group_size: int = 128,
                 block_m: int = 256,
                 block_n: int = 512,
                 block_k2: int = 512) -> jax.Array:
    B, K = x.shape
    K2, N = packed.shape
    assert K2 * 2 == K, (K2, K)
    G = K // group_size
    assert scales.shape == (G, N) and zeros.shape == (G, N)
    assert K2 % group_size == 0, 'need group_size | K/2 for half-split packing'

    # pad tokens up to a whole m-tile (jit buckets make B mostly aligned)
    block_m = min(block_m, _round_up(B, 8))
    Bp = _round_up(B, block_m)
    if Bp != B:
        x = jnp.pad(x, ((0, Bp - B), (0, 0)))
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

    body = (_w4a16_kernel_groupdot if B <= GROUP_DOT_MAX_M
            else _w4a16_kernel_prescale)
    grid = (Bp // block_m, N // block_n, K2 // block_k2)
    kernel = functools.partial(
        body, groups_per_tile=groups_per_tile,
        group_rows=group_size, out_dtype=x.dtype)
    y = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_k2), lambda m, n, k: (m, k)),
            pl.BlockSpec((block_m, block_k2), lambda m, n, k: (m, k)),
            pl.BlockSpec((block_k2, block_n), lambda m, n, k: (k, n)),
            pl.BlockSpec((G // 2, block_n), lambda m, n, k: (0, n)),
            pl.BlockSpec((G // 2, block_n), lambda m, n, k: (0, n)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda m, n, k: (m, n)),
        out_shape=jax.ShapeDtypeStruct((Bp, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32),
                        pltpu.VMEM((block_k2, block_n), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'arbitrary')),
    )(x_lo, x_hi, packed, s_lo, s_hi)
    y = y[:B]

    # zero-point correction: x @ (z*s) = (per-group x sums) @ (z*s)
    xg = x[:B].astype(jnp.float32).reshape(B, G, group_size).sum(-1)  # [B, G]
    corr = jnp.dot(xg, (zeros * s), preferred_element_type=jnp.float32)
    return (y.astype(jnp.float32) - corr).astype(x.dtype)


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def w4a16_matmul_reference(x, packed, scales, zeros, group_size: int = 128):
    """jnp dequant + dense matmul: correctness reference for the fused kernel
    and the CPU fallback.  NOT a serving path on TPU — round-tripping the
    dequantized bf16 weight through HBM measures 5-18x slower than the kernel."""
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
