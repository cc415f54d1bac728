"""Linear-layer dispatch: dense bf16 vs quantized (W4A16 / W8A8) weights.

Reference analog: ``lmdeploy/pytorch/nn/linear/`` (default / awq / w8a8 /
blocked_fp8 variants behind one build_linear API) and TurboMind's LlamaLinear
(``src/turbomind/models/llama/LlamaLinear.h:12`` — quantized GEMM dispatcher).

A weight leaf is either a plain jax.Array [K, N] (dense) or a dict:
  {'packed': u8[K/2, N], 'scales': f32[K/gs, N], 'zeros': f32[K/gs, N]}  (w4a16)
  {'packed': i32[L, K/8, N], 'sb': bf16, 'corr': f32|bf16 [, 'layer': i32]}
      (w4a16 "prepared" stacked leaf — see prep_quant_leaves/quant_matmul)
  {'w8': i8[K, N], 'scale': f32[N]}                                      (w8a8)
  {'w8': fp8_e4m3[K, N], 'scale': f32[N]}                      (fp8 weight-only)
Dispatch is static (pytree structure + w8 dtype), so one jitted step handles
any of them.  fp8 weight-only: weights stream from HBM at 1 byte/element and
are widened to the activation dtype on the fly (VPU convert) before a normal
MXU matmul — a pure bandwidth optimization with per-output-channel scales
applied after the matmul.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

# token count at or below which a W4A16 matmul uses the fused Pallas kernel
# instead of dequant + dense XLA matmul.  Slope-timed on v5e (r2,
# benchmark/bench_w4a16_kernel.py): the fused kernel wins at EVERY size —
# 1.5-2.1x vs dense bf16 at decode batches, 5-18x vs dequant+dense (which
# round-trips the full bf16 weight through HBM); above 256 tokens the kernel
# switches to its MXU-regime pre-scale schedule internally.  Default:
# always fused on TPU.  Set LMDEPLOY_TPU_W4_DENSE_SWITCH=<n> to force the
# dequant+dense path for token counts above n (0 = never use the kernel).
import os as _os
_DENSE_SWITCH = int(_os.environ.get('LMDEPLOY_TPU_W4_DENSE_SWITCH', str(1 << 30)))
_W4_GROUP = 128


def is_quantized(w: Any) -> bool:
    return isinstance(w, dict)


def linear(x: jax.Array, w: Any, bias: Optional[jax.Array] = None) -> jax.Array:
    """y = x @ w (+ bias). x: [..., K]; returns [..., N] in x.dtype."""
    if not is_quantized(w):
        y = jnp.dot(x, w, preferred_element_type=jnp.float32)
        if bias is not None:
            y = y + bias.astype(jnp.float32)
        return y.astype(x.dtype)

    if 'packed' in w:
        y = _w4a16(x, w)
    elif 'w8' in w:
        if 'bscale' in w:
            y = _w_fp8_blocked(x, w)
        elif w['w8'].dtype == jnp.float8_e4m3fn:
            y = _w_fp8(x, w)
        else:
            y = _w8a8(x, w)
    else:
        raise ValueError(f'unknown quantized weight leaf: {list(w)}')
    if bias is not None:
        y = (y.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)
    return y


def _w4a16(x: jax.Array, w: dict) -> jax.Array:
    from ..ops.attention import _on_tpu
    from ..ops.pallas.quant_matmul import w4a16_matmul, w4a16_matmul_reference

    lead = x.shape[:-1]
    K = x.shape[-1]
    x2d = x.reshape(-1, K)
    n_tok = x2d.shape[0]
    # K may be padded up to whole quant groups x 4 planes in the leaf
    # (lite/formats.py pad_k4); pad rows are exact zeros in the product
    Kp = w['packed'].shape[-2] * 8
    if Kp > K:
        x2d = jnp.pad(x2d, ((0, 0), (0, Kp - K)))
    if 'sb' in w:
        y = _w4a16_prepped(x2d, w)
    else:
        gs = (Kp // w['scales'].shape[-2])
        if _on_tpu() and n_tok <= _DENSE_SWITCH:
            y = w4a16_matmul(x2d, w['packed'], w['scales'], w['zeros'],
                             group_size=gs)
        else:
            # CPU fallback / env-forced: dequant to bf16, dense matmul
            y = w4a16_matmul_reference(x2d, w['packed'], w['scales'],
                                       w['zeros'], gs)
    return y.reshape(*lead, -1).astype(x.dtype)


# token count at/below which the stacked W4A16 kernel beats dequant+dense
# (above it the GEMM turns MXU-bound and dense runs at full matmul speed)
_STACKED_MAX_M = 256


def _w4a16_prepped(x2d: jax.Array, w: dict) -> jax.Array:
    """Prepared leaf {'packed','sb','corr'[,'layer']}: stacked Pallas kernel
    on TPU decode shapes, dense dequant otherwise (prefill / CPU).

    The 'layer' key is a traced scalar injected by the model's layer scan
    (LlamaModel.forward) so the kernel reads the full [L, ...] stacks with no
    per-layer slice; see ops/pallas/quant_matmul.py (round-5 design)."""
    from ..ops.attention import _on_tpu
    from ..ops.pallas.quant_matmul import w4a16_matmul_stacked
    K = x2d.shape[-1]
    packed, sb, corr = w['packed'], w['sb'], w['corr']
    gs = K // sb.shape[-2]
    stacked = packed.ndim == 3
    layer = w.get('layer')
    kernel_ok = (_on_tpu() and x2d.shape[0] <= min(_STACKED_MAX_M,
                                                   _DENSE_SWITCH)
                 and K % (4 * gs) == 0 and (K // 4) % 128 == 0)
    if stacked and kernel_ok:
        li = layer if layer is not None else 0
        return w4a16_matmul_stacked(x2d, packed, sb, corr, li, group_size=gs)
    if not stacked and kernel_ok:
        return w4a16_matmul_stacked(x2d, packed[None], sb[None], corr[None],
                                    0, group_size=gs)
    if stacked:
        idx = layer if layer is not None else 0
        packed = jax.lax.dynamic_index_in_dim(packed, idx, 0, keepdims=False)
        sb = jax.lax.dynamic_index_in_dim(sb, idx, 0, keepdims=False)
        corr = jax.lax.dynamic_index_in_dim(corr, idx, 0, keepdims=False)
    from ..ops.pallas.quant_matmul import w4a16_dense_szc
    return w4a16_dense_szc(x2d, packed, sb, corr, gs)


def _w8a8(x: jax.Array, w: dict) -> jax.Array:
    """SmoothQuant W8A8: dynamic per-token activation quant + int8 MXU matmul.

    XLA lowers int8xint8->int32 dot natively on TPU; no Pallas needed
    (reference analog: kernels/cuda/w8a8_triton_kernels.py).
    """
    lead = x.shape[:-1]
    x2d = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x2d), axis=-1, keepdims=True)
    a_scale = jnp.maximum(absmax / 127.0, 1e-8)
    xq = jnp.clip(jnp.round(x2d / a_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(xq, w['w8'], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * a_scale * w['scale'][None, :]
    return y.reshape(*lead, -1).astype(x.dtype)


def _w_fp8(x: jax.Array, w: dict) -> jax.Array:
    """fp8-e4m3 weight-only: widen weights, dense matmul, per-column scale."""
    lead = x.shape[:-1]
    x2d = x.reshape(-1, x.shape[-1])
    y = jnp.dot(x2d, w['w8'].astype(x.dtype),
                preferred_element_type=jnp.float32)
    y = y * w['scale'][None, :]
    return y.reshape(*lead, -1).astype(x.dtype)


def _w_fp8_blocked(x: jax.Array, w: dict) -> jax.Array:
    """Blocked-scale fp8-e4m3 (DeepSeek-V3 native 128x128 grids; reference
    nn/linear/blocked_fp8.py): widen weights, expand the scale grid over its
    blocks, dense MXU matmul.  Weights stream from HBM at 1 byte/element."""
    lead = x.shape[:-1]
    x2d = x.reshape(-1, x.shape[-1])
    w8, bs = w['w8'], w['bscale']                  # [K, N], [Kb, Nb]
    K, N = w8.shape
    b0 = -(-K // bs.shape[0])
    b1 = -(-N // bs.shape[1])
    s = jnp.repeat(jnp.repeat(bs, b0, axis=0)[:K], b1, axis=1)[:, :N]
    wf = w8.astype(jnp.bfloat16) * s.astype(jnp.bfloat16)
    y = jnp.dot(x2d.astype(jnp.bfloat16), wf, preferred_element_type=jnp.float32)
    return y.reshape(*lead, -1).astype(x.dtype)
