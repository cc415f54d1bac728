"""Batched-over-experts quantized matmul Pallas kernels (MoE serving path).

Reference analog: ``lmdeploy/pytorch/nn/moe/blocked_fp8.py`` (fp8 expert GEMMs)
and ``lmdeploy/pytorch/nn/moe/v4_fp4.py`` + ``src/turbomind/kernels/gemm/
convert_v3.cu`` (MXFP4 expert GEMMs).

Why this exists: DeepSeek-V3's routed experts are ~95% of its weights and ship
as blocked fp8-e4m3; gpt-oss ships MXFP4 (e2m1 nibbles + ue8m0 group scales).
Dequantizing at load loses the entire HBM-footprint win exactly where it
matters (a real V3 won't fit in bf16 on realistic slices), and widening a full
expert stack to bf16 per step would stream 2-4x the bytes.  These kernels keep
the expert stacks quantized in HBM and dequantize tile-by-tile in VMEM:

  * ``fp8_bmm``   — w8 fp8-e4m3 ``[E, K, N]`` + per-(128-row group, out column)
    scale rows ``[E, K/128, N]`` (the checkpoint's 128x128 block grid expanded
    along N at load; +3% bytes, removes 2D-block bookkeeping from the kernel).
    fp8 bits are decoded arithmetically (zext -> exponent/mantissa fields ->
    f32 bitcast) because Mosaic does not legalize fp8 casts on v5e.
  * ``mxfp4_bmm`` — e2m1 nibbles in the same "half-split" packing as the
    W4A16 kernel (``quant_matmul.py``: low nibble = input row r, high nibble =
    row K/2 + r, so both activation halves are contiguous slices) + f32 scale
    rows ``[E, K/32, N]`` (ue8m0 decoded at load).

Both run the pre-scale schedule (dequantized tile written group-by-group to a
bf16 VMEM scratch, one MXU dot per (k, n) tile): at decode the op is
weight-bandwidth-bound either way and the unpack already dominates VPU work;
at prefill pre-scale is the MXU regime.  Grid is ``(E, M/bm, N/bn, K/bk)``
with the K axis innermost ('arbitrary') accumulating into an f32 scratch.

``x`` may be rank-2 ``[M, K]`` (shared across experts: the gate/up GEMMs of a
dense-combine MoE step) or rank-3 ``[E, M, K]`` (per-expert activations: the
down GEMM).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FP8_GROUP = 128      # checkpoint block size along K (DeepSeek-V3 grids)
MXFP4_GROUP = 32     # e2m1 values per ue8m0 scale


def _decode_fp8_e4m3(bits_i32):
    """u8 bit patterns (zero-extended to i32) -> f32 values.

    e4m3fn: s eeee mmm; normals (1+m/8)*2^(e-7) assembled directly into f32
    bit fields (exact); subnormals m*2^-9; the single NaN code (0x7f/0xff)
    cannot appear in finite checkpoints.
    """
    e = (bits_i32 >> 3) & 0xF
    m = bits_i32 & 7
    f32bits = ((e + 120) << 23) | (m << 20)
    mag = jax.lax.bitcast_convert_type(f32bits, jnp.float32)
    mag = jnp.where(e == 0, m.astype(jnp.float32) * (2.0 ** -9), mag)
    return jnp.where(bits_i32 >= 128, -mag, mag)


def _decode_e2m1(nib_i32):
    """e2m1 nibble codes (0..15 as i32) -> f32 {0,.5,1,1.5,2,3,4,6} signed."""
    m = (nib_i32 & 1).astype(jnp.float32)
    e = (nib_i32 >> 1) & 3
    mag = jnp.where(
        e == 0, 0.5 * m,
        (2.0 + m) * jnp.where(e == 1, 0.5, jnp.where(e == 2, 1.0, 2.0)))
    return jnp.where((nib_i32 & 8) > 0, -mag, mag)


def _fp8_kernel(x_ref, w_ref, s_ref, out_ref, acc_ref, w_scr, *,
                groups_per_tile: int, group_rows: int, out_dtype):
    k_idx = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    bits = w_ref[0].astype(jnp.int32)              # u8 zext
    val = _decode_fp8_e4m3(bits)                   # f32 [bk, bn]
    g_base = k_idx * groups_per_tile
    for g in range(groups_per_tile):
        r0 = g * group_rows
        s_row = s_ref[0, pl.ds(g_base + g, 1), :]  # [1, bn] f32
        w_scr[r0:r0 + group_rows, :] = (
            val[r0:r0 + group_rows] * s_row).astype(jnp.bfloat16)
    x = x_ref[...] if x_ref.ndim == 2 else x_ref[0]
    acc_ref[...] += jnp.dot(x, w_scr[...], preferred_element_type=jnp.float32)

    @pl.when(k_idx == nk - 1)
    def _():
        out_ref[0] = acc_ref[...].astype(out_dtype)


def _mxfp4_kernel(x_lo_ref, x_hi_ref, nib_ref, s_lo_ref, s_hi_ref, out_ref,
                  acc_ref, w_scr, *, groups_per_tile: int, out_dtype):
    k_idx = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    p32 = nib_ref[0].astype(jnp.int32)             # u8 zext [bk2, bn]
    g_base = k_idx * groups_per_tile
    acc = acc_ref[...]
    for codes, x_ref, s_ref in ((p32 & 0xF, x_lo_ref, s_lo_ref),
                                (p32 >> 4, x_hi_ref, s_hi_ref)):
        val = _decode_e2m1(codes)                  # f32 [bk2, bn]
        for g in range(groups_per_tile):
            r0 = g * MXFP4_GROUP
            s_row = s_ref[0, pl.ds(g_base + g, 1), :]
            w_scr[r0:r0 + MXFP4_GROUP, :] = (
                val[r0:r0 + MXFP4_GROUP] * s_row).astype(jnp.bfloat16)
        acc = acc + jnp.dot(x_ref[...] if x_ref.ndim == 2 else x_ref[0],
                            w_scr[...], preferred_element_type=jnp.float32)
    acc_ref[...] = acc

    @pl.when(k_idx == nk - 1)
    def _():
        out_ref[0] = acc_ref[...].astype(out_dtype)


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _pick_blocks(M, N, K, group, block_m, block_n, block_k):
    block_m = min(block_m, _round_up(M, 8))
    block_n = min(block_n, N)
    while N % block_n:
        block_n //= 2
    block_k = min(block_k, K)
    while K % block_k or block_k % group:
        block_k //= 2
    assert block_k >= group, (block_k, group)
    return block_m, block_n, block_k


def _x_spec(x, block_m, block_k, half=None):
    """BlockSpec for x: rank-2 shared across experts, rank-3 per-expert.
    ``half`` selects the lo/hi K-half offset convention used by mxfp4 (the
    caller passes pre-sliced halves instead, so half is unused there)."""
    if x.ndim == 2:
        return pl.BlockSpec((block_m, block_k), lambda e, m, n, k: (m, k))
    return pl.BlockSpec((1, block_m, block_k), lambda e, m, n, k: (e, m, k))


@functools.partial(jax.jit, static_argnames=('block_m', 'block_n', 'block_k',
                                             'interpret'))
def fp8_bmm(x: jax.Array,        # [M, K] or [E, M, K] bf16/f32
            w8: jax.Array,       # [E, K, N] float8_e4m3fn
            gscale: jax.Array,   # [E, K/128, N] f32 (block grid expanded on N)
            block_m: int = 256, block_n: int = 512, block_k: int = 512,
            interpret: bool = False) -> jax.Array:
    """y[e] = x(@e) @ dequant(w8[e]); returns [E, M, N] f32.

    The scale group along K is inferred from the shapes (128 for DeepSeek-V3
    checkpoints; smaller in tests)."""
    E, K, N = w8.shape
    M = x.shape[-2]
    G = gscale.shape[1]
    assert K % G == 0, f'scale groups {G} must evenly divide K={K}'
    group = K // G
    assert gscale.shape == (E, G, N), (gscale.shape, (E, G, N))
    block_m, block_n, block_k = _pick_blocks(M, N, K, group,
                                             block_m, block_n, block_k)
    Mp = _round_up(M, block_m)
    xb = x.astype(jnp.bfloat16)
    if Mp != M:
        pad = [(0, 0)] * (x.ndim - 2) + [(0, Mp - M), (0, 0)]
        xb = jnp.pad(xb, pad)
    bits = jax.lax.bitcast_convert_type(w8, jnp.uint8)
    grid = (E, Mp // block_m, N // block_n, K // block_k)
    kernel = functools.partial(_fp8_kernel,
                               groups_per_tile=block_k // group,
                               group_rows=group, out_dtype=jnp.float32)
    y = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            _x_spec(xb, block_m, block_k),
            pl.BlockSpec((1, block_k, block_n), lambda e, m, n, k: (e, k, n)),
            pl.BlockSpec((1, G, block_n), lambda e, m, n, k: (e, 0, n)),
        ],
        out_specs=pl.BlockSpec((1, block_m, block_n),
                               lambda e, m, n, k: (e, m, n)),
        out_shape=jax.ShapeDtypeStruct((E, Mp, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32),
                        pltpu.VMEM((block_k, block_n), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'parallel',
                                 'arbitrary')),
        interpret=interpret,
    )(xb, bits, gscale)
    return y[:, :M]


@functools.partial(jax.jit, static_argnames=('block_m', 'block_n', 'block_k2',
                                             'interpret'))
def mxfp4_bmm(x: jax.Array,      # [M, K] or [E, M, K]
              nib: jax.Array,    # [E, K/2, N] u8 half-split e2m1 codes
              scale: jax.Array,  # [E, K/32, N] f32 (ue8m0 decoded)
              block_m: int = 256, block_n: int = 512, block_k2: int = 512,
              interpret: bool = False) -> jax.Array:
    """y[e] = x(@e) @ dequant(nib[e]); returns [E, M, N] f32."""
    E, K2, N = nib.shape
    K = K2 * 2
    M = x.shape[-2]
    G = K // MXFP4_GROUP
    assert scale.shape == (E, G, N), (scale.shape, (E, G, N))
    assert K2 % MXFP4_GROUP == 0, 'need 32 | K/2 for half-split packing'
    block_m, block_n, block_k2 = _pick_blocks(M, N, K2, MXFP4_GROUP,
                                              block_m, block_n, block_k2)
    Mp = _round_up(M, block_m)
    xb = x.astype(jnp.bfloat16)
    if Mp != M:
        pad = [(0, 0)] * (x.ndim - 2) + [(0, Mp - M), (0, 0)]
        xb = jnp.pad(xb, pad)
    x_lo = xb[..., :K2]
    x_hi = xb[..., K2:]
    s_lo = scale[:, :G // 2]
    s_hi = scale[:, G // 2:]
    grid = (E, Mp // block_m, N // block_n, K2 // block_k2)
    kernel = functools.partial(_mxfp4_kernel,
                               groups_per_tile=block_k2 // MXFP4_GROUP,
                               out_dtype=jnp.float32)
    y = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            _x_spec(x_lo, block_m, block_k2),
            _x_spec(x_hi, block_m, block_k2),
            pl.BlockSpec((1, block_k2, block_n), lambda e, m, n, k: (e, k, n)),
            pl.BlockSpec((1, G // 2, block_n), lambda e, m, n, k: (e, 0, n)),
            pl.BlockSpec((1, G // 2, block_n), lambda e, m, n, k: (e, 0, n)),
        ],
        out_specs=pl.BlockSpec((1, block_m, block_n),
                               lambda e, m, n, k: (e, m, n)),
        out_shape=jax.ShapeDtypeStruct((E, Mp, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32),
                        pltpu.VMEM((block_k2, block_n), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'parallel',
                                 'arbitrary')),
        interpret=interpret,
    )(x_lo, x_hi, nib, s_lo, s_hi)
    return y[:, :M]


# -- XLA references (CPU fallback / correctness oracles) --------------------------


def widen_fp8(w8: jax.Array, gscale: jax.Array, dtype=jnp.bfloat16):
    """[E, K, N] fp8 + [E, K/g, N] scale rows -> dense [E, K, N]."""
    wf = w8.astype(jnp.float32)
    group = w8.shape[-2] // gscale.shape[-2]
    s = jnp.repeat(gscale, group, axis=-2)[..., :w8.shape[-2], :]
    return (wf * s).astype(dtype)


def widen_mxfp4(nib: jax.Array, scale: jax.Array, dtype=jnp.bfloat16):
    """[E, K/2, N] half-split e2m1 + [E, K/32, N] scales -> dense [E, K, N]."""
    p32 = nib.astype(jnp.int32)
    lo = _decode_e2m1(p32 & 0xF)
    hi = _decode_e2m1(p32 >> 4)
    vals = jnp.concatenate([lo, hi], axis=-2)          # half-split layout
    s = jnp.repeat(scale, MXFP4_GROUP, axis=-2)
    return (vals * s).astype(dtype)


def fp8_bmm_reference(x, w8, gscale):
    w = widen_fp8(w8, gscale)
    eq = 'mk,ekn->emn' if x.ndim == 2 else 'emk,ekn->emn'
    return jnp.einsum(eq, x.astype(jnp.bfloat16), w,
                      preferred_element_type=jnp.float32)


def mxfp4_bmm_reference(x, nib, scale):
    w = widen_mxfp4(nib, scale)
    eq = 'mk,ekn->emn' if x.ndim == 2 else 'emk,ekn->emn'
    return jnp.einsum(eq, x.astype(jnp.bfloat16), w,
                      preferred_element_type=jnp.float32)
