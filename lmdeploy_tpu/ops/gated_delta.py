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
    import os
    if (not return_states and q.shape[1] >= CHUNK_MIN_T
            and os.environ.get('LMDEPLOY_TPU_GDN_CHUNKED', '1') != '0'):
        # long prefill: the chunked formulation does T/64 sequential steps of
        # [64, 64] MXU matrices instead of T rank-1 scan steps — numerically
        # equal (see gated_delta_chunked)
        return gated_delta_chunked(q, k, v, g, beta, state0, valid=valid)
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


CHUNK = 64                 # chunked-prefill block (reference kernels use 64)
CHUNK_MIN_T = 64           # below this the per-token scan wins


def _tri_inv_unit_lower(A: jax.Array) -> jax.Array:
    """(I + A)^{-1} for strictly-lower-triangular A, by doubling.

    A is nilpotent (A^C = 0), so (I+A)^{-1} = (I-A)(I-A^2)^{-1} recurses in
    log2(C) rounds of [C, C] matmuls — MXU work instead of the sequential
    substitution a triangular solve lowers to on TPU.
    """
    C = A.shape[-1]
    eye = jnp.eye(C, dtype=A.dtype)
    # sum_j (-A)^j = (I + N)(I + N^2)(I + N^4)...  with N = -A; even powers
    # of N are +A^{2^k}
    inv = eye - A
    P = A @ A
    n = 2
    while n < C:
        inv = inv @ (eye + P)
        P = P @ P
        n *= 2
    return inv


def gated_delta_chunked(q, k, v, g, beta, state0, valid=None,
                        chunk: int = CHUNK):
    """Chunked gated delta rule — same math as the per-token scan, O(T/C)
    sequential steps of [C, C] MXU matrices instead of T steps of rank-1
    updates (reference: ``src/turbomind/kernels/linear_attn/`` 16.9k LoC of
    chunked CUDA; transformers ``torch_chunk_gated_delta_rule``).

    Derivation (per head; S in R^{dk x dv}, G = in-chunk cumsum of g):
      within a chunk, deltas solve the unit-lower-triangular system
        (I + A) D = B,   A[t,i] = beta_t exp(G_t - G_i) (k_t . k_i)  (i < t)
                         B[t]  = beta_t (v_t - exp(G_t) (S_0^T k_t))
      then  o_t  = exp(G_t) q_t^T S_0 + sum_{i<=t} exp(G_t - G_i)(q_t.k_i) d_i
            S_C  = exp(G_C) S_0 + sum_i exp(G_C - G_i) k_i (x) d_i
      Every exponent is <= 0 (g <= 0 and i <= t), so nothing overflows.
    """
    B_, T, Hv, dk = q.shape
    dv = v.shape[-1]
    qf = l2norm(q.astype(jnp.float32)) * (dk ** -0.5)
    kf = l2norm(k.astype(jnp.float32))
    vf = v.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    bf = beta.astype(jnp.float32)
    if valid is not None:
        gf = jnp.where(valid[..., None], gf, 0.0)
        bf = jnp.where(valid[..., None], bf, 0.0)

    C = min(chunk, T)
    pad = (-T) % C
    if pad:
        qf = jnp.pad(qf, ((0, 0), (0, pad), (0, 0), (0, 0)))
        kf = jnp.pad(kf, ((0, 0), (0, pad), (0, 0), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, pad), (0, 0), (0, 0)))
        gf = jnp.pad(gf, ((0, 0), (0, pad), (0, 0)))
        bf = jnp.pad(bf, ((0, 0), (0, pad), (0, 0)))
    NC = (T + pad) // C

    def to_chunks(x, feat):
        x = x.reshape(B_, NC, C, Hv, *feat)
        return jnp.moveaxis(x, 1, 0)                     # [NC, B, C, Hv, ...]

    qc, kc, vc = to_chunks(qf, (dk,)), to_chunks(kf, (dk,)), \
        to_chunks(vf, (dv,))
    gc, bc = to_chunks(gf, ()), to_chunks(bf, ())

    tril = jnp.tril(jnp.ones((C, C), bool), -1)
    tril_inc = jnp.tril(jnp.ones((C, C), bool))

    def chunk_step(S, xs):
        qx, kx, vx, gx, bx = xs                          # [B, C, Hv, *]
        G = jnp.cumsum(gx, axis=1)                       # [B, C, Hv]
        eG = jnp.exp(G)
        # D[t, i] = exp(G_t - G_i), masked to i <= t (exponent <= 0)
        Gd = G[:, :, None, :] - G[:, None, :, :]         # [B, C, C, Hv]
        D = jnp.exp(jnp.where(tril_inc[None, :, :, None], Gd, -jnp.inf))
        kk = jnp.einsum('bthk,bihk->btih', kx, kx)       # [B, C, C, Hv]
        A = jnp.where(tril[None, :, :, None], kk * D, 0.0) \
            * bx[:, :, None, :]
        A = jnp.moveaxis(A, -1, 1)                       # [B, Hv, C, C]
        inv = _tri_inv_unit_lower(A.reshape(B_ * Hv, C, C)).reshape(
            B_, Hv, C, C)
        cross = jnp.einsum('bthk,bhkv->bthv', kx, S)     # S_0^T k_t
        Bmat = (vx - cross * eG[..., None]) * bx[..., None]
        delta = jnp.einsum('bhti,bihv->bthv', inv, Bmat)  # [B, C, Hv, dv]
        qkT = jnp.einsum('bthk,bihk->btih', qx, kx) * D
        qkT = jnp.where(tril_inc[None, :, :, None], qkT, 0.0)
        o = (jnp.einsum('bthk,bhkv->bthv', qx, S) * eG[..., None]
             + jnp.einsum('btih,bihv->bthv', qkT, delta))
        decay_end = jnp.exp(G[:, -1])                    # [B, Hv]
        wK = jnp.exp(G[:, -1][:, None] - G) [..., None] * kx  # [B,C,Hv,dk]
        S = (S * decay_end[..., None, None]
             + jnp.einsum('bthk,bthv->bhkv', wK, delta))
        return S, o

    state, out = jax.lax.scan(chunk_step, state0.astype(jnp.float32),
                              (qc, kc, vc, gc, bc))
    out = jnp.moveaxis(out, 0, 1).reshape(B_, NC * C, Hv, dv)[:, :T]
    return out, state


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
