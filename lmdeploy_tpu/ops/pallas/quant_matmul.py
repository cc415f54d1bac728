"""Fused W4A16 dequant + matmul Pallas kernel (AWQ/GPTQ serving path).

Reference analog: the CUDA W4A16 fused dequant-GEMM in ``src/turbomind/kernels/gemm/``
(gemm_universal, convert kernels) and ``lmdeploy/pytorch/kernels/cuda/awq_kernels.py``.

TPU design:
  * Storage layout is OURS, not AWQ's: the loader unpacks AWQ/GPTQ int32 words and
    repacks to ``packed u8[K/2, N]`` where byte (k2, n) holds weights for input rows
    2*k2 (low nibble) and 2*k2+1 (high nibble).  Group-wise ``scales f32[K/gs, N]``
    and ``zeros f32[K/gs, N]`` ride alongside.  Dequant: w = (q - z) * s.
  * Decode GEMMs are weight-bandwidth-bound: reading 4 bits/weight instead of 16
    is the entire win (reference reports 2.4x, w4a16.md).  The kernel streams packed
    tiles HBM->VMEM via the standard Pallas pipeline (auto double-buffered), unpacks
    with VPU bit ops, and feeds the MXU in bf16.
  * Activations are pre-split into even/odd K rows outside the kernel so nibble
    unpacking never needs a lane-interleave: y = x_even @ w_lo + x_odd @ w_hi.
"""
from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _w4a16_kernel(x2_ref, packed_ref, scales_ref, zeros_ref, out_ref, acc_ref,
                  *, group_size: int, out_dtype):
    """One (n, k) grid step: acc += x2[:, k-tile] @ dequant(packed[k-tile, n-tile])."""
    k_idx = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    packed = packed_ref[...]                     # [TK2, TN] uint8
    lo = (packed & 0xF).astype(jnp.float32)
    hi = (packed >> 4).astype(jnp.float32)

    # block_k == group_size: one scale/zero row per k-tile, plain broadcast
    s = scales_ref[...]                          # [1, TN] f32
    z = zeros_ref[...]
    w_lo = ((lo - z) * s).astype(jnp.bfloat16)
    w_hi = ((hi - z) * s).astype(jnp.bfloat16)

    x_even = x2_ref[0]                           # [B, TK2]
    x_odd = x2_ref[1]
    acc_ref[...] += (
        jnp.dot(x_even, w_lo, preferred_element_type=jnp.float32)
        + jnp.dot(x_odd, w_hi, preferred_element_type=jnp.float32))

    @pl.when(k_idx == nk - 1)
    def _():
        out_ref[...] = acc_ref[...].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=('group_size', 'block_n', 'block_k'))
def w4a16_matmul(x: jax.Array,            # [B, K] bf16/f32
                 packed: jax.Array,       # [K//2, N] uint8 (nibble-packed along K)
                 scales: jax.Array,       # [K//gs, N] f32
                 zeros: jax.Array,        # [K//gs, N] f32
                 group_size: int = 128,
                 block_n: int = 256,
                 block_k: int = 512) -> jax.Array:
    B, K = x.shape
    K2, N = packed.shape
    assert K2 * 2 == K, (K2, K)
    assert K % group_size == 0
    # one quant group per k-tile keeps the scale broadcast trivial; the Pallas
    # pipeline double-buffers tiles so the shorter k-tile costs nothing
    block_k = group_size
    block_n = min(block_n, N)
    assert K % block_k == 0 and N % block_n == 0

    # split activations into even/odd input rows (matches nibble packing)
    x2 = jnp.stack([x[:, 0::2], x[:, 1::2]], axis=0).astype(jnp.bfloat16)  # [2,B,K/2]

    tk2 = block_k // 2
    tkg = 1
    grid = (N // block_n, K // block_k)

    kernel = functools.partial(_w4a16_kernel, group_size=group_size,
                               out_dtype=x.dtype)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((2, B, tk2), lambda n, k: (0, 0, k)),
            pl.BlockSpec((tk2, block_n), lambda n, k: (k, n)),
            pl.BlockSpec((tkg, block_n), lambda n, k: (k, n)),
            pl.BlockSpec((tkg, block_n), lambda n, k: (k, n)),
        ],
        out_specs=pl.BlockSpec((B, block_n), lambda n, k: (0, n)),
        out_shape=jax.ShapeDtypeStruct((B, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((B, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'arbitrary')),
    )(x2, packed, scales, zeros)


def w4a16_matmul_reference(x, packed, scales, zeros, group_size: int = 128):
    """jnp reference for tests: unpack + dequant + dense matmul."""
    K2, N = packed.shape
    K = K2 * 2
    lo = (packed & 0xF).astype(jnp.float32)
    hi = (packed >> 4).astype(jnp.float32)
    q = jnp.stack([lo, hi], axis=1).reshape(K, N)       # interleave rows
    s = jnp.repeat(scales, group_size, axis=0)
    z = jnp.repeat(zeros, group_size, axis=0)
    w = (q - z) * s
    return jnp.dot(x.astype(jnp.float32), w).astype(x.dtype)


def pack_w4(w_q: jax.Array) -> jax.Array:
    """Pack int4 values (0..15) [K, N] -> u8[K/2, N] (low nibble = even row)."""
    w_q = jnp.asarray(w_q, jnp.uint8)
    lo = w_q[0::2]
    hi = w_q[1::2]
    return (lo | (hi << 4)).astype(jnp.uint8)


def quantize_w4(w: jax.Array, group_size: int = 128):
    """Group-wise asymmetric 4-bit quantization of a dense [K, N] weight.

    Returns (packed u8[K/2,N], scales f32[K/gs,N], zeros f32[K/gs,N]) in the layout
    w4a16_matmul expects.  Matches AWQ's asymmetric min/max scheme
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
