"""Gated DeltaNet linear attention (Qwen3-Next) — recurrence + causal conv.

Reference analog: ``lmdeploy/pytorch/nn/gated_delta.py`` +
``kernels/cuda/gated_delta_rule.py`` and TurboMind's
``src/turbomind/kernels/linear_attn/`` (16.9k LoC of chunked CUDA kernels).

TPU-first design: the recurrence is a ``lax.scan`` over time whose per-step
body is pure batched einsum work — XLA keeps the [B, Hv, dk, dv] state in
registers/VMEM across steps and fuses the update chain.  Decode IS the
recurrence (one step), so the multi-step decode-run machinery carries the
state exactly like the paged KV cache (donated, in-place).  Prefill uses the
same scan — numerically exact w.r.t. decode by construction (the reference's
chunked kernels are a throughput optimization for long prefills; a chunked
``torch_chunk_gated_delta_rule``-style formulation can replace the scan
behind this interface later).

Math (matches transformers' ``torch_recurrent_gated_delta_rule``):
    q, k l2-normalized per head; q *= dk**-0.5
    S_t = S_{t-1} * exp(g_t)
    delta_t = (v_t - k_t^T S_t) * beta_t
    S_t += k_t (x) delta_t
    o_t = q_t^T S_t
with g = -exp(A_log) * softplus(a + dt_bias), beta = sigmoid(b).

Padding steps are masked by (g=0, beta=0): exp(0)=1 and a zero write leave
the state untouched, so ragged batches need no control flow.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def l2norm(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    """FLA-style l2 normalization over the last dim."""
    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + eps)


def gated_delta_scan(q: jax.Array, k: jax.Array, v: jax.Array,
                     g: jax.Array, beta: jax.Array, state0: jax.Array,
                     valid: Optional[jax.Array] = None,
                     return_states: bool = False,
                     ) -> Tuple[jax.Array, ...]:
    """Run the gated delta recurrence over a token chunk.

    Args:
      q, k:    [B, T, Hv, dk] (already repeated to value heads)
      v:       [B, T, Hv, dv]
      g:       [B, T, Hv] log decay (<= 0)
      beta:    [B, T, Hv] write strength in [0, 1]
      state0:  [B, Hv, dk, dv] recurrent state
      valid:   [B, T] bool; False steps leave the state untouched
      return_states: also return the state AFTER each step — the per-position
        snapshots speculative verification rolls back to when draft tokens
        are rejected (reference allocates 1+num_spec_tokens state copies:
        configurations/qwen3_5.py recurrent_state_shape)

    Returns (out [B, T, Hv, dv], state_T[, states [B, T, Hv, dk, dv]]).
    """
    dk = q.shape[-1]
    qf = l2norm(q.astype(jnp.float32)) * (dk ** -0.5)
    kf = l2norm(k.astype(jnp.float32))
    vf = v.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    bf = beta.astype(jnp.float32)
    if valid is not None:
        gf = jnp.where(valid[..., None], gf, 0.0)
        bf = jnp.where(valid[..., None], bf, 0.0)

    # time-major for the scan
    qt = jnp.moveaxis(qf, 1, 0)
    kt = jnp.moveaxis(kf, 1, 0)
    vt = jnp.moveaxis(vf, 1, 0)
    gt = jnp.moveaxis(gf, 1, 0)
    bt = jnp.moveaxis(bf, 1, 0)

    def step(S, xs):
        q_t, k_t, v_t, g_t, b_t = xs                    # [B,Hv,dk] etc.
        S = S * jnp.exp(g_t)[..., None, None]
        kv_mem = jnp.einsum('bhk,bhkv->bhv', k_t, S)
        delta = (v_t - kv_mem) * b_t[..., None]
        S = S + jnp.einsum('bhk,bhv->bhkv', k_t, delta)
        o_t = jnp.einsum('bhk,bhkv->bhv', q_t, S)
        ys = (o_t, S) if return_states else o_t
        return S, ys

    state, out = jax.lax.scan(step, state0.astype(jnp.float32),
                              (qt, kt, vt, gt, bt))
    if return_states:
        out, states = out
        return (jnp.moveaxis(out, 0, 1), state,
                jnp.moveaxis(states, 0, 1))
    return jnp.moveaxis(out, 0, 1), state


def causal_conv1d(x: jax.Array, conv_state: jax.Array, weight: jax.Array,
                  bias: Optional[jax.Array], lens: jax.Array,
                  ) -> Tuple[jax.Array, jax.Array]:
    """Depthwise causal conv over a chunk, continuing from per-row state.

    Args:
      x:          [B, T, C] chunk inputs (padding rows arbitrary)
      conv_state: [B, K-1, C] last K-1 valid inputs before this chunk
      weight:     [C, K] depthwise taps (HF conv1d.weight[:, 0, :])
      bias:       [C] or None
      lens:       [B] valid tokens in the chunk

    Returns (silu(conv(x)) [B, T, C], new conv_state [B, K-1, C]).
    """
    B, T, C = x.shape
    K = weight.shape[-1]
    full = jnp.concatenate([conv_state.astype(x.dtype), x], axis=1)
    y = jnp.zeros((B, T, C), jnp.float32)
    for j in range(K):
        y = y + full[:, j:j + T].astype(jnp.float32) * weight[:, j]
    if bias is not None:
        y = y + bias
    y = jax.nn.silu(y)

    # new state = last K-1 VALID inputs: full[len + i], i in [0, K-1)
    idx = lens[:, None] + jnp.arange(K - 1, dtype=lens.dtype)[None, :]
    new_state = jnp.take_along_axis(full, idx[:, :, None], axis=1)
    return y.astype(x.dtype), new_state.astype(conv_state.dtype)


def gate_decay(a: jax.Array, b: jax.Array, a_log: jax.Array,
               dt_bias: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(g, beta) from the raw (a, b) projections and learned per-head params."""
    g = -jnp.exp(a_log.astype(jnp.float32)) * jax.nn.softplus(
        a.astype(jnp.float32) + dt_bias.astype(jnp.float32))
    return g, jax.nn.sigmoid(b.astype(jnp.float32))
