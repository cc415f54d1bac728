"""Fused on-device sampling pipeline.

Reference analog: ``lmdeploy/pytorch/engine/logits_process.py`` (FusedLogitsProcessor:
temperature / top-k / top-p / min-p, repetition & frequency/presence penalties, bad
words, logprobs capture) and TurboMind's ``generation/`` + ``kernels/sampling_*.cu``.

Everything runs in one jitted function on [B, V] logits; per-row parameters come in as
flat arrays so one compiled executable serves every request mix.  Top-k/top-p/min-p with
*per-row* parameters are implemented via one descending sort shared by all three filters
(a full [B,V] sort is a few ms at V=128k on TPU and is dwarfed by the model forward; a
Pallas bitonic/threshold kernel can replace it later without touching callers).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = float('-inf')


@dataclass
class SamplingInputs:
    """Per-row sampling parameters, already batched into device arrays."""

    temperature: jax.Array        # [B] f32
    top_k: jax.Array              # [B] i32 (0 = disabled)
    top_p: jax.Array              # [B] f32 (1.0 = disabled)
    min_p: jax.Array              # [B] f32 (0.0 = disabled)
    repetition_penalty: jax.Array  # [B] f32 (1.0 = disabled)
    frequency_penalty: jax.Array  # [B] f32
    presence_penalty: jax.Array   # [B] f32
    do_sample: jax.Array          # [B] bool
    seeds: jax.Array              # [B] u32 per-row seed
    bad_words_mask: Optional[jax.Array] = None   # [B, V] bool, True = banned
    max_top_logprobs: int = 0     # static: max logprobs requested in batch

    @classmethod
    def from_seqs(cls, seqs, vocab_size: int) -> 'SamplingInputs':
        """Pack per-sequence SamplingParams into flat numpy arrays (host side).

        Per-row seeds derive from (random_seed, tokens generated so far) so a request
        replayed with the same seed reproduces its samples regardless of how it was
        batched (reference semantics: per-request determinism).
        """
        n = len(seqs)
        temperature = np.ones(n, np.float32)
        top_k = np.zeros(n, np.int32)
        top_p = np.ones(n, np.float32)
        min_p = np.zeros(n, np.float32)
        rep = np.ones(n, np.float32)
        freq = np.zeros(n, np.float32)
        pres = np.zeros(n, np.float32)
        do_sample = np.zeros(n, bool)
        seeds = np.zeros(n, np.uint32)
        bad_rows = []
        max_lp = 0
        for i, seq in enumerate(seqs):
            p = seq.sampling_params
            temperature[i] = p.temperature
            top_k[i] = p.top_k
            top_p[i] = p.top_p
            min_p[i] = p.min_p
            rep[i] = p.repetition_penalty
            freq[i] = p.frequency_penalty
            pres[i] = p.presence_penalty
            do_sample[i] = p.do_sample
            n_out = getattr(seq, 'num_output_tokens', 0)
            seeds[i] = np.uint32(((p.random_seed or 0)
                                  + (n_out + 1) * 0x9E3779B9) & 0xFFFFFFFF)
            if p.bad_token_ids:
                bad_rows.append((i, p.bad_token_ids))
            guide = getattr(seq, 'guided', None)
            if guide is not None:
                bad_rows.append((i, guide))
            max_lp = max(max_lp, p.logprobs if p.logprobs > 0 else 0)
        bad_mask = None
        if bad_rows:
            bad_mask = np.zeros((n, vocab_size), dtype=bool)
            for i, ids in bad_rows:
                if hasattr(ids, 'allowed_mask'):   # guided-decoding state
                    bad_mask[i] = ~ids.allowed_mask()
                else:
                    ids = [t for t in ids if 0 <= t < vocab_size]
                    bad_mask[i, ids] = True
        return cls(temperature=temperature, top_k=top_k, top_p=top_p, min_p=min_p,
                   repetition_penalty=rep, frequency_penalty=freq,
                   presence_penalty=pres, do_sample=do_sample, seeds=seeds,
                   bad_words_mask=bad_mask, max_top_logprobs=max_lp)


jax.tree_util.register_dataclass(
    SamplingInputs,
    data_fields=['temperature', 'top_k', 'top_p', 'min_p', 'repetition_penalty',
                 'frequency_penalty', 'presence_penalty', 'do_sample', 'seeds',
                 'bad_words_mask'],
    meta_fields=['max_top_logprobs'])


def apply_penalties(logits: jax.Array, token_counts: jax.Array,
                    inputs: SamplingInputs,
                    prompt_mask: Optional[jax.Array] = None) -> jax.Array:
    """Repetition (seen-token), frequency and presence penalties.

    ``token_counts`` is [B, V] int: counts of *generated* tokens only — OpenAI
    semantics for frequency/presence penalties.  ``prompt_mask`` is [B, V] bool
    marking tokens present in the prompt; repetition penalty covers
    prompt+generated (HF/reference semantics, logits_process.py
    _process_repetition_penalty_) while frequency/presence ignore the prompt.
    """
    counts = token_counts.astype(jnp.float32)
    generated = counts > 0
    seen = generated if prompt_mask is None else (generated | prompt_mask)

    rep = inputs.repetition_penalty[:, None]
    penalized = jnp.where(logits > 0, logits / rep, logits * rep)
    logits = jnp.where(seen, penalized, logits)

    logits = logits - counts * inputs.frequency_penalty[:, None]
    logits = logits - generated.astype(jnp.float32) * inputs.presence_penalty[:, None]
    return logits


# Filtering thresholds are derived from the top KMAX candidates only — a full-vocab
# jnp.sort is pathologically slow on TPU (minutes for [B, 32k]); lax.top_k(kmax) plus
# elementwise value-threshold masks gives identical results whenever the effective
# candidate set fits in kmax.  The default is 64; callers whose batch contains a
# top_k > 64 request pass a wider (power-of-two bucketed) kmax so the requested
# distribution is honored exactly (the engine picks the bucket per decode run).
# A top_p nucleus wider than the top-kmax mass falls back to no filtering, which
# only widens the distribution.
TOPK_CANDIDATES = 64


def topk_bucket(max_top_k: int, vocab_size: int) -> int:
    """Candidate-set width for a batch whose largest top_k is ``max_top_k``."""
    k = TOPK_CANDIDATES
    while k < max_top_k and k < vocab_size:
        k *= 2
    return min(k, vocab_size)


def _top_k_p_min_p_mask(logits: jax.Array, inputs: SamplingInputs,
                        kmax: int = TOPK_CANDIDATES) -> jax.Array:
    """Combined top-k / top-p / min-p filtering with per-row parameters (sort-free)."""
    B, V = logits.shape
    kmax = min(kmax, V)
    top_vals, _ = jax.lax.top_k(logits, kmax)                      # [B, kmax] desc
    max_logit = top_vals[:, :1]

    # top-k: threshold = k-th largest; disabled (0) -> -inf
    k = jnp.clip(inputs.top_k, 0, kmax).astype(jnp.int32)
    kth_val = jnp.take_along_axis(top_vals, jnp.clip(k[:, None] - 1, 0, kmax - 1),
                                  axis=-1)                          # [B,1]
    kth_val = jnp.where((inputs.top_k > 0)[:, None], kth_val, -jnp.inf)
    keep = logits >= kth_val

    # softmax pieces without sorting: full denominator is an elementwise reduce
    denom = jnp.sum(jnp.exp(logits - max_logit), axis=-1, keepdims=True)
    top_probs = jnp.exp(top_vals - max_logit) / denom               # [B, kmax]

    # top-p: smallest prefix of the top candidates with cum >= p; if the nucleus
    # is wider than the top-kmax mass, keep everything (cutoff -inf)
    cumsum = jnp.cumsum(top_probs, axis=-1)
    include = (cumsum - top_probs) < inputs.top_p[:, None]          # prefix-exclusive
    last_idx = jnp.maximum(jnp.sum(include.astype(jnp.int32), axis=-1) - 1, 0)
    p_cut = jnp.take_along_axis(top_vals, last_idx[:, None], axis=-1)
    covered = cumsum[:, -1:] >= inputs.top_p[:, None]
    active_p = (inputs.top_p < 1.0)[:, None] & covered
    keep &= jnp.where(active_p, logits >= p_cut, True)

    # min-p: prob >= min_p * max_prob  <=>  logit >= max_logit + log(min_p)
    minp_thresh = max_logit + jnp.log(jnp.maximum(inputs.min_p, 1e-38))[:, None]
    keep &= jnp.where((inputs.min_p > 0)[:, None], logits >= minp_thresh, True)

    # never mask out the argmax
    keep |= logits >= max_logit
    return keep


def sample_logits(logits: jax.Array, inputs: SamplingInputs, token_counts: jax.Array,
                  prompt_mask: Optional[jax.Array] = None,
                  kmax: int = TOPK_CANDIDATES,
                  full_vocab: bool = False,
                  ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Full sampling pipeline.

    The default ("candidate") path keeps everything after the penalties on the
    top-``kmax`` candidate set: one lax.top_k, [B, kmax] filter math, and a
    gumbel-max draw over kmax candidates — the round-1 path spent ~1.7 ms/step
    at bs64/V=32k, dominated by full-vocab threefry for the categorical draw
    plus several [B, V] passes.  Exact whenever every sampled row's effective
    support fits in kmax (the engine widens kmax per decode run, and routes
    batches containing a pure-ancestral row — do_sample with no top-k/p/min-p
    truncation — to ``full_vocab=True``, which samples over the whole vocab).

    Returns (next_tokens [B] i32, logprob_of_sampled [B] f32, top_logprob
    vals/ids or zeros when logprobs disabled).
    """
    logits = logits.astype(jnp.float32)
    if inputs.bad_words_mask is not None:
        logits = jnp.where(inputs.bad_words_mask, NEG_INF, logits)
    logits = apply_penalties(logits, token_counts, inputs, prompt_mask)
    B, V = logits.shape
    kmax = min(kmax, V)

    if full_vocab:
        greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        scaled = logits / inputs.temperature[:, None]
        keep = _top_k_p_min_p_mask(scaled, inputs, kmax)
        masked = jnp.where(keep, scaled, NEG_INF)
        sampled = jax.vmap(lambda s, row: jax.random.categorical(
            jax.random.key(s), row))(inputs.seeds, masked).astype(jnp.int32)
        next_tokens = jnp.where(inputs.do_sample, sampled, greedy)
        logprobs_all = jax.nn.log_softmax(logits, axis=-1)
        chosen_lp = jnp.take_along_axis(logprobs_all, next_tokens[:, None],
                                        axis=-1)[:, 0]
        if inputs.max_top_logprobs > 0:
            top_vals, top_ids = jax.lax.top_k(logprobs_all,
                                              inputs.max_top_logprobs)
        else:
            top_vals = jnp.zeros((B, 1), jnp.float32)
            top_ids = jnp.zeros((B, 1), jnp.int32)
        return next_tokens, chosen_lp, (top_vals, top_ids)

    # temperature > 0 is monotonic, so candidate order is temperature-free:
    # ONE top-k on the raw (penalized) logits serves filtering, sampling,
    # greedy (candidate 0) and top-logprobs.  lax.top_k lowers to a FULL
    # [B, V] sort inside the decode-run scan (measured 1.6 ms/step at bs64,
    # V=32k); the TPU-native two-pass PartialReduce (approx_max_k at recall
    # 1.0 = exact) plus a [B, kmax] re-sort is ~20x cheaper.
    cand_raw, cand_ids = jax.lax.approx_max_k(logits, kmax,
                                              recall_target=1.0)
    order = jnp.argsort(-cand_raw, axis=-1)
    cand_raw = jnp.take_along_axis(cand_raw, order, axis=-1)  # [B, kmax] desc
    cand_ids = jnp.take_along_axis(cand_ids, order, axis=-1)
    greedy = cand_ids[:, 0].astype(jnp.int32)
    temp = inputs.temperature[:, None]
    cand = cand_raw / temp                                  # scaled candidates
    max_s = cand[:, :1]
    # full-vocab softmax denominator over SCALED logits (top-p needs true
    # probabilities); the /temp folds into the single [B, V] reduce
    denom_s = jnp.sum(jnp.exp(logits / temp - max_s), axis=-1, keepdims=True)
    cand_probs = jnp.exp(cand - max_s) / denom_s            # [B, kmax]

    j = jnp.arange(kmax, dtype=jnp.int32)[None, :]
    keep = jnp.where((inputs.top_k > 0)[:, None],
                     j < inputs.top_k[:, None], True)
    cumsum = jnp.cumsum(cand_probs, axis=-1)
    include = (cumsum - cand_probs) < inputs.top_p[:, None]  # prefix-exclusive
    covered = cumsum[:, -1:] >= inputs.top_p[:, None]
    active_p = (inputs.top_p < 1.0)[:, None] & covered
    keep &= jnp.where(active_p, include, True)
    minp_thresh = max_s + jnp.log(jnp.maximum(inputs.min_p, 1e-38))[:, None]
    keep &= jnp.where((inputs.min_p > 0)[:, None], cand >= minp_thresh, True)
    keep = keep.at[:, 0].set(True)                          # argmax always kept

    # gumbel-max over the kept candidates == categorical over their softmax.
    # Noise comes from a counter-based integer hash (murmur3 finalizer) over
    # (per-row seed, candidate index) rather than a vmap of 64 threefry key
    # setups — measured 0.57 ms/step cheaper inside the decode run at bs64,
    # with the same per-request determinism (a pure function of the request
    # seed and step counter folded into inputs.seeds).
    ctr = (inputs.seeds[:, None] * jnp.uint32(0x9E3779B9)
           + (jnp.arange(kmax, dtype=jnp.uint32)
              * jnp.uint32(0x85EBCA6B))[None, :])
    x = ctr
    x ^= x >> 16
    x *= jnp.uint32(0x7FEB352D)
    x ^= x >> 15
    x *= jnp.uint32(0x846CA68B)
    x ^= x >> 16
    u = (x >> 8).astype(jnp.float32) * (1.0 / (1 << 24)) + 1e-12
    gumbel = -jnp.log(-jnp.log(u))
    z = jnp.where(keep, cand + gumbel, NEG_INF)
    sampled = jnp.take_along_axis(
        cand_ids, jnp.argmax(z, axis=-1)[:, None], axis=-1)[:, 0].astype(jnp.int32)
    next_tokens = jnp.where(inputs.do_sample, sampled, greedy)

    # log Z of the UNSCALED distribution for reported logprobs
    max0 = cand_raw[:, :1]
    logz = max0 + jnp.log(jnp.sum(jnp.exp(logits - max0), axis=-1,
                                  keepdims=True))
    chosen_lp = (jnp.take_along_axis(logits, next_tokens[:, None], axis=-1)
                 - logz)[:, 0]

    if inputs.max_top_logprobs > 0:
        n = min(inputs.max_top_logprobs, kmax)
        top_vals = cand_raw[:, :n] - logz
        top_ids = cand_ids[:, :n]
    else:
        top_vals = jnp.zeros((B, 1), jnp.float32)
        top_ids = jnp.zeros((B, 1), jnp.int32)
    return next_tokens, chosen_lp, (top_vals, top_ids)


def update_token_counts(token_counts: jax.Array, tokens: jax.Array,
                        valid: jax.Array) -> jax.Array:
    """Scatter-add sampled tokens into the per-row seen-token counts."""
    B = token_counts.shape[0]
    rows = jnp.arange(B, dtype=jnp.int32)
    inc = valid.astype(token_counts.dtype)
    return token_counts.at[rows, tokens].add(inc)
