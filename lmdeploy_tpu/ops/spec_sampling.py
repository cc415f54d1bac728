"""Batched rejection sampling for speculative decoding.

Reference analog: ``lmdeploy/pytorch/spec_decode/reject_sampler.py`` (batched
rejection sampler used by the EAGLE/MTP proposers).

Standard speculative-sampling rule (Leviathan et al.): accept draft token d_i with
probability min(1, p_tgt(d_i)/p_draft(d_i)); at the first rejection, resample from
the residual distribution max(0, p_tgt - p_draft) (renormalized); if every draft
token is accepted, sample a bonus token from the target's last-position
distribution.  All tensor shapes are static — ideal for TPU.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=())
def reject_sample(
    target_probs: jax.Array,   # [B, K+1, V] target distributions per position
    draft_probs: jax.Array,    # [B, K, V] draft distributions
    draft_tokens: jax.Array,   # [B, K] i32 proposed tokens
    key: jax.Array,            # PRNG key, or [B] per-row keys
) -> Tuple[jax.Array, jax.Array]:
    """Returns (out_tokens [B, K+1] i32, num_emitted [B] i32).

    out_tokens[b, :num_emitted[b]] are valid: the accepted prefix, then either the
    residual resample (on rejection) or the bonus token (all accepted).  Positions
    beyond num_emitted are padded with the last valid token.
    """
    B, K1, V = target_probs.shape
    K = K1 - 1
    # a single key (typed scalar key or legacy raw uint32[2]) drives the
    # classic shared stream; a [B] typed-key batch gives per-row streams
    batched = jnp.issubdtype(key.dtype, jax.dtypes.prng_key) and key.ndim == 1
    if not batched:
        k_accept, k_resid, k_bonus = jax.random.split(key, 3)
        resid_keys = jax.random.split(k_resid, B)
        bonus_keys = jax.random.split(k_bonus, B)
    else:
        # [B] per-row keys: the stream depends only on each row's own
        # (seed, step_no) — outputs are invariant to batch composition and
        # to stale state in other rows (matches the AR counter-hash design)
        resid_keys = jax.vmap(lambda k: jax.random.fold_in(k, 1))(key)
        bonus_keys = jax.vmap(lambda k: jax.random.fold_in(k, 2))(key)

    p_tgt_at_draft = jnp.take_along_axis(
        target_probs[:, :K], draft_tokens[..., None], axis=-1)[..., 0]   # [B, K]
    p_draft_at_draft = jnp.take_along_axis(
        draft_probs, draft_tokens[..., None], axis=-1)[..., 0]           # [B, K]

    if not batched:
        u = jax.random.uniform(k_accept, (B, K))
    else:
        u = jax.vmap(lambda k: jax.random.uniform(
            jax.random.fold_in(k, 0), (K,)))(key)
    ratio = p_tgt_at_draft / jnp.maximum(p_draft_at_draft, 1e-20)
    accept = u < jnp.minimum(ratio, 1.0)                                 # [B, K]

    # number of accepted tokens = length of the accepted PREFIX
    prefix_ok = jnp.cumprod(accept.astype(jnp.int32), axis=-1)           # [B, K]
    n_accept = jnp.sum(prefix_ok, axis=-1)                               # [B]
    all_accepted = n_accept == K

    # residual distribution at the first rejected position
    first_rej = jnp.minimum(n_accept, K - 1)                             # [B]
    tgt_at_rej = jnp.take_along_axis(
        target_probs, first_rej[:, None, None], axis=1)[:, 0]            # [B, V]
    drf_at_rej = jnp.take_along_axis(
        draft_probs, jnp.minimum(first_rej, K - 1)[:, None, None], axis=1)[:, 0]
    residual = jnp.maximum(tgt_at_rej - drf_at_rej, 0.0)
    resid_norm = jnp.sum(residual, axis=-1, keepdims=True)
    # degenerate residual (identical dists): fall back to the target itself
    residual = jnp.where(resid_norm > 1e-20, residual / jnp.maximum(resid_norm,
                                                                    1e-20),
                         tgt_at_rej)
    resid_tok = jax.vmap(
        lambda k, p: jax.random.choice(k, V, p=p))(
        resid_keys, residual).astype(jnp.int32)                          # [B]

    bonus_tok = jax.vmap(
        lambda k, p: jax.random.choice(k, V, p=p))(
        bonus_keys, target_probs[:, K]).astype(jnp.int32)

    # emit: accepted prefix, then resid (rejection) or bonus (all accepted)
    extra_tok = jnp.where(all_accepted, bonus_tok, resid_tok)            # [B]
    pos = jnp.arange(K1, dtype=jnp.int32)[None, :]                      # [1, K+1]
    out = jnp.where(pos < n_accept[:, None],
                    jnp.pad(draft_tokens, ((0, 0), (0, 1))), extra_tok[:, None])
    num_emitted = n_accept + 1
    return out.astype(jnp.int32), num_emitted.astype(jnp.int32)


def expected_acceptance_rate(target_probs: jax.Array, draft_probs: jax.Array
                             ) -> jax.Array:
    """Analytic per-position acceptance rate 1 - TV(p_tgt, p_draft) (diagnostics)."""
    tv = 0.5 * jnp.sum(jnp.abs(target_probs[:, :draft_probs.shape[1]] - draft_probs),
                       axis=-1)
    return 1.0 - tv
