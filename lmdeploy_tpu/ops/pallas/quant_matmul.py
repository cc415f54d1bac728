"""Fused W4A16 dequant + matmul Pallas kernel (AWQ/GPTQ serving path).

Reference analog: the CUDA W4A16 fused dequant-GEMM in ``src/turbomind/kernels/gemm/``
(gemm_universal, convert kernels) and ``lmdeploy/pytorch/kernels/cuda/awq_kernels.py``.

TPU design (round-4 rewrite; measured on the v6e-class chip behind the tunnel):

  * Storage layout is OURS ("plane-packed i32"): word ``r`` of
    ``packed i32[K/8, N]`` holds 8 nibbles; plane ``j`` (j=0..3) covers input
    rows ``[j*K/4, (j+1)*K/4)`` and its pair of nibbles sits at bits
    ``[4j, 4j+4)`` (even plane row ``2r``) and ``[16+4j, 16+4j+4)`` (odd plane
    row ``2r+1``).  Three i32 VPU ops then decode a whole plane:

        v = ((p >> 4j) & 0x000F000F) | 0x43004300
        plane = bitcast(v, bf16)            # = 128 + q, rows (2r, 2r+1)

    The bitcast halves-to-sublanes interleave is exactly the (even, odd) pair,
    so the decoded plane is a contiguous [K/4, N] bf16 tile with NO layout
    shuffles, NO u8->i32 widening, and NO int->float converts.  0x4300 pins the
    bf16 exponent at 2^7 (ulp = 1), making 128+q exact; the +128 bias folds
    into the zero-point correction below.  The round-2 u8 "half-split" kernel
    spent ~4 VPU ops/byte plus widening shuffles on the same job and capped at
    ~200-400 GB/s of packed bandwidth in-engine — the entire W4A16 e2e
    regression of BENCH_r03 (w4a16_vs_bf16 = 0.823).

  * Decode GEMMs (M <= GROUP_DOT_MAX_M) run the "group-dot" schedule: scales
    hit the f32 *dot output* per quant group, so per-weight VPU work is just
    the 3-op decode.

  * Prefill GEMMs (M > GROUP_DOT_MAX_M) dequantize through XLA (same
    arithmetic, fused elementwise) and run ONE dense bf16 MXU matmul.  The
    extra HBM round-trip of the bf16 weight amortizes over the whole chunk;
    at M >= 1024 the matmul is MXU-bound and runs at dense speed — the old
    in-kernel "pre-scale" schedule measured 0.67-0.75x dense and dragged the
    mixed-serving W4A16 number below bf16.

  * Zero points never enter the kernel: (q - z)*s = (q + 128)*s - (z + 128)*s,
    and the ``x @ ((z+128)*s)`` correction collapses to per-group activation
    sums times a precomputed [G, N] table — a tiny XLA GEMM outside.  The
    correction dot MUST run at Precision.HIGHEST: its magnitude is ~17x the
    signal (the +128 bias), so default-precision bf16 operand rounding there
    injects ~10% relative error into the difference.  Likewise the kernel
    emits f32 and the bf16 cast happens only after the correction is
    subtracted.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# token count at/below which the group-dot kernel beats dequant+dense
# (the dense path streams 4x the weight bytes + a full bf16 round-trip;
# measured crossover is far above this, but beyond ~256 tokens the GEMM
# turns MXU-bound and the dense path wins on pure matmul throughput)
GROUP_DOT_MAX_M = 256

_MAGIC = 0x43004300          # bf16 pair (128.0, 128.0): exponent 2^7, ulp 1

# measured-best (block_k, block_n) per weight shape at decode M<=64 on the
# v6e-class chip (benchmark/tune_w4a16.py, long-chain slope timing; the
# reference ships a full GEMM autotuner — src/turbomind/kernels/gemm/tuner/).
# Unlisted shapes fall back to the heuristic in _pick_blocks.
_TUNED_BLOCKS = {
    (2048, 2560): (512, 1024),      # tinyllama fused qkv        892 GB/s
    (2048, 2048): (1024, 1024),     # o_proj                     544 GB/s
    (2048, 11264): (2048, 2048),    # fused gate_up              430 GB/s
    (5632, 2048): (512, 1024),      # down                       343 GB/s
    (4096, 14336): (1024, 2048),    # llama-8B gate/up           471 GB/s
    (14336, 4096): (1024, 2048),    # llama-8B down              578 GB/s
}


def _pick_blocks(K: int, N: int):
    if (K, N) in _TUNED_BLOCKS:
        return _TUNED_BLOCKS[(K, N)]
    return 1024, (2048 if N > 4096 else 1024)


def _decode_plane(p: jax.Array, j: int) -> jax.Array:
    """i32 word tile [W, bn] -> bf16 plane tile [2W, bn] holding 128 + q."""
    t = p >> (4 * j) if j else p
    v = (t & 0x000F000F) | _MAGIC
    return pltpu.bitcast(v, jnp.bfloat16)


def _w4a16_kernel_groupdot(x0, x1, x2, x3, p_ref, s0, s1, s2, s3,
                           out_ref, acc_ref, *, groups_per_tile: int,
                           group_rows: int):
    """One (m, n, k) grid step: acc += sum_plane sum_group (x_g @ d_g) * s_g
    with d = 128 + q decoded arithmetically (see module docstring)."""
    k_idx = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    p = p_ref[...]
    acc = acc_ref[...]
    g_base = k_idx * groups_per_tile
    for j, (x_ref, s_ref) in enumerate(((x0, s0), (x1, s1), (x2, s2), (x3, s3))):
        plane = _decode_plane(p, j)
        for g in range(groups_per_tile):
            r0 = g * group_rows
            part = jnp.dot(x_ref[:, r0:r0 + group_rows],
                           plane[r0:r0 + group_rows],
                           preferred_element_type=jnp.float32)
            acc = acc + part * s_ref[pl.ds(g_base + g, 1), :]
    acc_ref[...] = acc

    @pl.when(k_idx == nk - 1)
    def _():
        out_ref[...] = acc_ref[...]           # f32; bias removed by the caller


def dequant_w4(packed: jax.Array, scales: jax.Array, zeros: jax.Array,
               group_size: int = 128, dtype=jnp.bfloat16) -> jax.Array:
    """Plane-packed i32[K/8, N] -> dense [K, N] dequantized weight (XLA ops,
    CPU-safe).  Used by the prefill path and as the correctness reference."""
    K8, N = packed.shape
    K = K8 * 8
    planes = []
    for j in range(4):
        even = (packed >> (4 * j)) & 0xF                  # plane row 2r
        odd = (packed >> (16 + 4 * j)) & 0xF              # plane row 2r+1
        pair = jnp.stack([even, odd], axis=1)             # [K/8, 2, N]
        planes.append(pair.reshape(K8 * 2, N))
    q = jnp.concatenate(planes, axis=0).astype(jnp.float32)   # [K, N]
    s = jnp.repeat(scales.astype(jnp.float32), group_size, axis=0)
    z = jnp.repeat(zeros.astype(jnp.float32), group_size, axis=0)
    return ((q - z) * s).astype(dtype)


@functools.partial(jax.jit, static_argnames=('group_size', 'block_m',
                                             'block_n', 'block_k'))
def w4a16_matmul(x: jax.Array,            # [B, K] bf16/f32
                 packed: jax.Array,       # [K/8, N] i32 (plane-packed)
                 scales: jax.Array,       # [K/gs, N] f32
                 zeros: jax.Array,        # [K/gs, N] f32
                 group_size: int = 128,
                 block_m: int = 256,
                 block_n: int = 0,
                 block_k: int = 0) -> jax.Array:
    B, K = x.shape
    K8, N = packed.shape
    assert K8 * 8 == K, (K8, K)
    if not block_n or not block_k:
        tk, tn = _pick_blocks(K, N)
        block_k = block_k or tk
        block_n = block_n or tn
    G = K // group_size
    assert scales.shape == (G, N) and zeros.shape == (G, N)

    s = scales.astype(jnp.float32)
    if B > GROUP_DOT_MAX_M or K % (4 * group_size):
        # prefill regime (or a K that breaks the 4-plane group alignment):
        # dequant through XLA, one dense MXU matmul
        w = dequant_w4(packed, s, zeros, group_size)
        y = jnp.dot(x.astype(jnp.bfloat16), w,
                    preferred_element_type=jnp.float32)
        return y.astype(x.dtype)

    Kq = K // 4                              # rows per plane
    Gq = G // 4                              # groups per plane

    block_m = min(block_m, _round_up(B, 8))
    Bp = _round_up(B, block_m)
    if Bp != B:
        x = jnp.pad(x, ((0, Bp - B), (0, 0)))
    block_n = min(block_n, N)
    while N % block_n:
        block_n //= 2
    # plane rows per k-step: the largest multiple-of-group_size divisor of Kq
    # that fits the cap (divisor, not power-of-two, so K = 11*512-style dims
    # keep a coarse k-grid instead of collapsing to one group per step)
    ng = Kq // group_size
    per = max(d for d in range(1, ng + 1)
              if ng % d == 0 and d * group_size <= max(block_k, group_size))
    bk = per * group_size

    xb = x.astype(jnp.bfloat16)
    xs = [xb[:, j * Kq:(j + 1) * Kq] for j in range(4)]
    ss = [s[j * Gq:(j + 1) * Gq] for j in range(4)]

    grid = (Bp // block_m, N // block_n, Kq // bk)
    kernel = functools.partial(_w4a16_kernel_groupdot,
                               groups_per_tile=per, group_rows=group_size)
    y = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((block_m, bk), lambda m, n, k: (m, k))] * 4 +
                 [pl.BlockSpec((bk // 2, block_n), lambda m, n, k: (k, n))] +
                 [pl.BlockSpec((Gq, block_n), lambda m, n, k: (0, n))] * 4,
        out_specs=pl.BlockSpec((block_m, block_n), lambda m, n, k: (m, n)),
        out_shape=jax.ShapeDtypeStruct((Bp, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'arbitrary')),
    )(*xs, packed, *ss)
    y = y[:B]

    # zero-point correction with the +128 decode bias folded in:
    #   x @ ((q - z) * s) = kernel_out - x @ ((z + 128) * s)
    # HIGHEST precision is load-bearing, and xg MUST come from the same
    # bf16-rounded activations the kernel consumed — the bias term is ~17x
    # the signal, so any x mismatch between the two sides is amplified ~17x
    # (see module docstring); y stays f32 until the bias is gone.
    xg = xb[:B].astype(jnp.float32).reshape(B, G, group_size).sum(-1)  # [B, G]
    corr = jnp.dot(xg, (zeros + 128.0) * s,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    return (y - corr).astype(x.dtype)


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


# ---------------------------------------------------------------------------
# Stacked-layer schedule (round 5).
#
# Two round-4 findings motivated this rewrite (see VERDICT r4 weak #1:
# W4A16 decode lost to bf16 at bs64 two rounds running):
#
#   1. In the real engine the per-layer weights are lax.scan slices of a
#      stacked [L, ...] array.  XLA cannot fuse a dynamic-slice into a Mosaic
#      custom-call, so every layer paid a materialized slice copy (a kLoop
#      fusion writing the full packed tile to scratch) BEFORE the kernel ran
#      — serializing a full-weight copy with the kernel and wrecking the DMA
#      pipeline.  The stacked kernel takes the FULL [L, K/8, N] array plus a
#      scalar-prefetched layer index; BlockSpec index maps add the layer
#      offset, so tiles stream straight from HBM with no slice, no copy.
#   2. The group-dot schedule was VPU-op-bound: ablation on the v5e measured
#      packed-bandwidth scaling exactly linearly in VPU ops/weight
#      (bitcast-only 530 GB/s -> +decode 388 -> +scale 298 -> +zero 227).
#      So the schedule below spends the absolute minimum VPU work per weight
#      and moves every per-GROUP term onto the MXU:
#
#        y = sum_j x_j @ (decode(p, j) * s)  -  xg @ corr
#
#      where xg[m, g] = sum_{k in group g} x[m, k] (computed once outside,
#      O(B*K)) and corr[g, n] folds the decode bias AND the zero point:
#      decode gives 128 + q, so with corr = (z + 128) * s the result is
#      exactly x @ ((q - z) * s).  The per-group correction becomes one
#      [B, G] x [G, bn] MXU dot per tile instead of K*bn VPU ops.
#
# Precision (fast mode): the one rounding is (128+q)*s -> bf16, a per-weight
# random error of std ~0.15*s vs the int4 quantization noise itself at
# ~0.29*s — a ~12% bump of the existing quant noise, measured harmless at
# the ppl gate.  The correction operands MUST be f32: the corr term is ~30x
# the signal (the +128 bias), so bf16 operand rounding there would inject
# ~6% output error (this was round 4's hard-won HIGHEST-precision lesson).
# xg is computed in f32 from the SAME bf16-rounded x the kernel consumes, so
# the bias term cancels exactly.
#
# Precise mode (corr/xg in bf16): the kernel subtracts the integer 135
# (= 128 + 7; exact in bf16 — integers to 256 are representable, half-
# integers above 128 are NOT) from the decoded plane before scaling, making
# the scaled weight (q-7)*s exact to bf16's 2^-9 relative — the same error
# class as the reference's fp16 dequant kernels — at one extra VPU op per
# weight (measured 275 vs 376 GB/s packed).  corr = (z - 7)*s is then
# signal-sized, so bf16 corr operands are safe.
# ---------------------------------------------------------------------------

_C135 = 135.0    # 128 (decode bias) + 7 (nibble center; must be integral)


def prep_w4(scales: jax.Array, zeros: jax.Array, precise: bool = False,
            mode: str | None = None):
    """f32 (scales, zeros) -> (sb, corr) operands for the stacked kernel.

    Fast:    sb = bf16(s), corr = f32((z + 128) * s).
    Precise: sb = bf16(s), corr = bf16((z - 7) * s).
    gd:      sb = f32(s),  corr = f32((z + 128) * s) — group-dot schedule:
             scales hit the f32 *dot outputs* per quant group, so the main
             term carries NO per-weight rounding at all (best accuracy of the
             three) and the kernel spends only the 3-op nibble decode per
             weight on the VPU (fastest at decode M; see the round-5 module
             comment).
    The (sb, corr) dtypes statically select the kernel mode downstream:
    sb f32 -> gd; else corr bf16 -> precise, corr f32 -> fast.
    Works on [G, N] or [L, G, N].
    """
    if mode is None:
        mode = 'precise' if precise else 'fast'
    z = zeros.astype(jnp.float32)
    if mode == 'gd':
        s = scales.astype(jnp.float32)
        return s, (z + 128.0) * s
    sb = scales.astype(jnp.bfloat16)
    # corr MUST be built from the bf16-ROUNDED scales: the kernel's main term
    # is (128+q)*sb, so a corr built from unrounded s leaves the s-rounding
    # error on the ~30x bias term uncanceled (group-systematic ~0.26*s error,
    # measured 15% output error before this fix).
    s = sb.astype(jnp.float32)
    if mode == 'precise':
        return sb, ((z - 7.0) * s).astype(jnp.bfloat16)
    return sb, (z + 128.0) * s


def dequant_w4_szc(packed: jax.Array, sb: jax.Array, corr: jax.Array,
                   group_size: int = 128, dtype=jnp.bfloat16) -> jax.Array:
    """Dense dequant from prepared (sb, corr) operands (mode by corr dtype).

    XLA-only (CPU-safe); the prefill path and correctness reference for
    w4a16_matmul_stacked."""
    K8, N = packed.shape
    K = K8 * 8
    planes = []
    for j in range(4):
        even = (packed >> (4 * j)) & 0xF
        odd = (packed >> (16 + 4 * j)) & 0xF
        planes.append(jnp.stack([even, odd], axis=1).reshape(K8 * 2, N))
    q = jnp.concatenate(planes, axis=0).astype(jnp.float32)       # [K, N]
    s = jnp.repeat(sb.astype(jnp.float32), group_size, axis=0)
    c = jnp.repeat(corr.astype(jnp.float32), group_size, axis=0)
    bias = 7.0 if corr.dtype == jnp.bfloat16 else -128.0          # gd: -128
    return ((q - bias) * s - c).astype(dtype)


def dequant_w4_biased(packed: jax.Array, sb: jax.Array,
                      group_size: int = 128) -> jax.Array:
    """bf16 (128 + q) * sb — the fast-mode kernel's main-term weights,
    INCLUDING its per-weight bf16 product rounding.  The dense fallback uses
    this so CPU/prefill results (and the accuracy gate) carry the same
    numerics as the Pallas kernel."""
    K8, N = packed.shape
    planes = []
    for j in range(4):
        even = (packed >> (4 * j)) & 0xF
        odd = (packed >> (16 + 4 * j)) & 0xF
        planes.append(jnp.stack([even, odd], axis=1).reshape(K8 * 2, N))
    q = jnp.concatenate(planes, axis=0).astype(jnp.bfloat16) + jnp.bfloat16(128)
    s = jnp.repeat(sb.astype(jnp.bfloat16), group_size, axis=0)
    return q * s                                   # bf16 product rounding


def w4a16_dense_szc(x2d: jax.Array, packed: jax.Array, sb: jax.Array,
                    corr: jax.Array, group_size: int = 128) -> jax.Array:
    """Dense-path GEMM over prepared operands, numerics-matched to the
    stacked kernel mode (corr dtype selects): used for CPU fallback and
    prefill."""
    xb = x2d.astype(jnp.bfloat16)
    if corr.dtype == jnp.bfloat16 or sb.dtype == jnp.float32:
        # precise / gd modes: dequant in f32, single bf16 rounding, dense dot
        w = dequant_w4_szc(packed, sb, corr, group_size)
        return jnp.dot(xb, w, preferred_element_type=jnp.float32)
    B, K = xb.shape
    G = K // group_size
    wmain = dequant_w4_biased(packed, sb, group_size)
    y = jnp.dot(xb, wmain, preferred_element_type=jnp.float32)
    xg = xb.astype(jnp.float32).reshape(B, G, group_size).sum(-1)
    c = jnp.dot(xg, corr.astype(jnp.float32),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    return y - c


def _w4a16_kernel_stacked(li_ref, x0, x1, x2, x3, xg_ref, p_ref, s_ref, c_ref,
                          out_ref, *, group_rows: int, groups_per_plane: int,
                          precise: bool):
    """One (m, n) step: per plane, decode -> scale in-register -> one wide
    MXU dot; per-group corrections ride a [B, G] x [G, bn] MXU dot."""
    del li_ref                                   # consumed by the index maps
    p = p_ref[0]                                 # [K/8, bn] i32
    bn = p.shape[-1]
    gs, Gq = group_rows, groups_per_plane
    acc = None
    for j, x_ref in enumerate((x0, x1, x2, x3)):
        plane = _decode_plane(p, j)              # [Kq, bn] bf16 = 128 + q
        if precise:
            plane = plane - jnp.bfloat16(_C135)  # exact: integers, |t|<=8
        t = plane.reshape(Gq, gs, bn)
        s = s_ref[0, j * Gq:(j + 1) * Gq, :][:, None, :]     # [Gq, 1, bn]
        w = (t * s).reshape(Gq * gs, bn)
        d = jnp.dot(x_ref[...], w, preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d
    # fast mode: f32 corr operands MUST NOT be bf16-truncated by the MXU
    # (default precision) — the corr term is ~30x the signal.  HIGHEST runs
    # the tiny [B, G] x [G, bn] dot in full f32; G is small so it's free.
    prec = None if precise else jax.lax.Precision.HIGHEST
    corr = jnp.dot(xg_ref[...], c_ref[0], preferred_element_type=jnp.float32,
                   precision=prec)
    out_ref[...] = (acc - corr).astype(out_ref.dtype)


def _w4a16_kernel_stacked_gd(li_ref, x0, x1, x2, x3, xg_ref, p_ref, s_ref,
                             c_ref, out_ref, *, group_rows: int,
                             groups_per_plane: int):
    """Group-dot schedule (round 5): per plane, decode -> one MXU dot per
    quant group; the f32 scale multiplies the DOT OUTPUT [B, bn] instead of
    the weights [gs, bn], so per-weight VPU work is just the 3-op nibble
    decode (the measured VPU-boundedness lever — see module comment) and the
    main term carries no per-weight rounding at all."""
    del li_ref                                   # consumed by the index maps
    p = p_ref[0]                                 # [K/8, bn] i32
    gs, Gq = group_rows, groups_per_plane
    acc = None
    for j, x_ref in enumerate((x0, x1, x2, x3)):
        plane = _decode_plane(p, j)              # [Kq, bn] bf16 = 128 + q
        x = x_ref[...]
        for g in range(Gq):
            r0 = g * gs
            d = jnp.dot(x[:, r0:r0 + gs], plane[r0:r0 + gs],
                        preferred_element_type=jnp.float32)      # [B, bn]
            t = d * s_ref[0, pl.ds(j * Gq + g, 1), :]            # f32 scale
            acc = t if acc is None else acc + t
    # bias removal: main term is x @ (128+q)*s summed per group; corr =
    # xg @ ((z+128) * s) cancels the +128 bias and applies the zero point.
    # HIGHEST: the corr term is ~30x the signal (round-4 lesson).
    corr = jnp.dot(xg_ref[...], c_ref[0], preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    out_ref[...] = (acc - corr).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=('group_size', 'block_n',
                                             'block_k'))
def w4a16_matmul_stacked(x: jax.Array,        # [B, K] bf16/f32
                         packed: jax.Array,   # [L, K/8, N] i32 plane-packed
                         sb: jax.Array,       # [L, K/gs, N] bf16 scales
                         corr: jax.Array,     # [L, K/gs, N] (see prep_w4)
                         layer,               # scalar int32 (traced ok)
                         group_size: int = 128,
                         block_n: int = 0,
                         block_k: int = 0) -> jax.Array:
    """Decode-regime W4A16 GEMM reading layer ``layer`` of stacked weights.

    Designed to sit inside a lax.scan over layers: the full stacks are passed
    every call and the scalar-prefetched layer index offsets the BlockSpec
    index maps, so no per-layer slice is ever materialized.  Reference
    analog: the tuned W4A16 fused GEMMs of src/turbomind/kernels/gemm/."""
    B, K = x.shape
    L, K8, N = packed.shape
    assert K8 * 8 == K, (K8, K)
    gs = group_size
    G = K // gs
    gd = sb.dtype == jnp.float32                 # group-dot schedule
    precise = not gd and corr.dtype == jnp.bfloat16
    assert sb.shape == (L, G, N) and corr.shape == (L, G, N)
    assert K % (4 * gs) == 0, (K, gs)     # caller falls back to dense
    if not block_n:
        block_n = _pick_blocks_stacked(K, N)

    Kq = K // 4                          # K rows per plane
    Gq = G // 4                          # groups per plane
    assert Kq % 128 == 0, (K,)           # x block minor dim alignment
    bn = min(block_n, N)
    while N % bn:
        bn //= 2

    Bp = _round_up(B, 8)
    xb = x.astype(jnp.bfloat16)
    if Bp != B:
        xb = jnp.pad(xb, ((0, Bp - B), (0, 0)))
    # per-group activation sums for the correction dot; f32, from the SAME
    # bf16-rounded x the kernel consumes (the ~30x bias term must cancel
    # against the main dot exactly — see module comment)
    xg = xb.astype(jnp.float32).reshape(Bp, G, gs).sum(-1)
    if precise:
        xg = xg.astype(jnp.bfloat16)
    li = jnp.asarray(layer, jnp.int32).reshape(1)

    grid = (1, N // bn)
    x_spec = [pl.BlockSpec((Bp, Kq),
                           functools.partial(lambda j, m, n, li: (m, j), j))
              for j in range(4)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=x_spec + [
            pl.BlockSpec((Bp, G), lambda m, n, li: (m, 0)),
            pl.BlockSpec((1, K8, bn), lambda m, n, li: (li[0], 0, n)),
            pl.BlockSpec((1, G, bn), lambda m, n, li: (li[0], 0, n)),
            pl.BlockSpec((1, G, bn), lambda m, n, li: (li[0], 0, n)),
        ],
        out_specs=pl.BlockSpec((Bp, bn), lambda m, n, li: (m, n)),
    )
    if gd:
        kernel = functools.partial(_w4a16_kernel_stacked_gd,
                                   group_rows=gs, groups_per_plane=Gq)
    else:
        kernel = functools.partial(_w4a16_kernel_stacked,
                                   group_rows=gs, groups_per_plane=Gq,
                                   precise=precise)
    y = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bp, N), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel')),
    )(li, xb, xb, xb, xb, xg, packed, sb, corr)
    return y[:B]


# -- runtime GEMM dispatch table (reference analog: the per-GPU tuned
# dispatch cache TurboMind persists and loads at startup,
# src/turbomind/kernels/gemm/dispatch_cache.cu).  An in-tree JSON maps
# device_kind -> {"KxN": block_n}, produced by benchmark/tune_w4a16.py
# --write on the target chip; LMDEPLOY_TPU_W4_DISPATCH points at a
# user-local table that overrides it.
DISPATCH_PATH = __import__('os').path.join(
    __import__('os').path.dirname(__import__('os').path.abspath(__file__)),
    'w4a16_dispatch.json')
_TUNED_BLOCKS_STACKED = None


def _load_dispatch():
    import os
    table = {}
    for path in (DISPATCH_PATH, os.environ.get('LMDEPLOY_TPU_W4_DISPATCH')):
        if not path or not os.path.exists(path):
            continue
        try:
            import json
            with open(path) as f:
                by_dev = json.load(f)
        except (OSError, ValueError):
            continue
        try:
            dev = jax.devices()[0].device_kind
        except Exception:  # noqa: BLE001
            dev = ''
        # exact device first, else any entry whose key shares the family
        # prefix (e.g. "TPU v5" matches "TPU v5 lite")
        entries = by_dev.get(dev)
        if entries is None:
            for k, v in by_dev.items():
                if dev and (k.startswith(dev[:6]) or dev.startswith(k[:6])):
                    entries = v
                    break
        for key, bn in (entries or {}).items():
            kk, nn = key.split('x')
            table[(int(kk), int(nn))] = int(bn)
    return table


def _pick_blocks_stacked(K: int, N: int):
    global _TUNED_BLOCKS_STACKED
    if _TUNED_BLOCKS_STACKED is None:
        _TUNED_BLOCKS_STACKED = _load_dispatch()
    if (K, N) in _TUNED_BLOCKS_STACKED:
        return _TUNED_BLOCKS_STACKED[(K, N)]
    return 1024


def w4a16_matmul_reference(x, packed, scales, zeros, group_size: int = 128):
    """jnp dequant + dense matmul: correctness reference for the fused kernel
    and the CPU fallback (identical math to the prefill path)."""
    w = dequant_w4(packed, scales, zeros, group_size)
    return jnp.dot(x.astype(jnp.bfloat16), w,
                   preferred_element_type=jnp.float32).astype(x.dtype)


def pack_w4(w_q) -> jax.Array:
    """Pack int4 values (0..15) [K, N] -> plane-packed i32[K/8, N].

    Plane j covers rows [j*K/4, (j+1)*K/4); word r gets plane row 2r at bits
    [4j, 4j+4) and plane row 2r+1 at bits [16+4j, 16+4j+4).
    """
    q = np.asarray(w_q, np.uint32)
    K, N = q.shape
    assert K % 8 == 0, K
    Kq = K // 4
    out = np.zeros((K // 8, N), np.uint32)
    for j in range(4):
        pj = q[j * Kq:(j + 1) * Kq]
        out |= pj[0::2] << (4 * j)
        out |= pj[1::2] << (16 + 4 * j)
    return jnp.asarray(out.view(np.int32))


def quantize_w4(w: jax.Array, group_size: int = 128):
    """Group-wise asymmetric 4-bit quantization of a dense [K, N] weight.

    Returns (packed i32[K/8,N], scales f32[K/gs,N], zeros f32[K/gs,N]) in the
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
    q = np.asarray(q.reshape(K, N), np.uint8)
    return pack_w4(q), scales, zeros
