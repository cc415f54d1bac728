"""Fused sampling pipeline tests."""
import jax.numpy as jnp
import numpy as np

from lmdeploy_tpu.ops.sampling import SamplingInputs, sample_logits


def make_inputs(B, V, **over):
    base = dict(
        temperature=np.ones(B, np.float32),
        top_k=np.zeros(B, np.int32),
        top_p=np.ones(B, np.float32),
        min_p=np.zeros(B, np.float32),
        repetition_penalty=np.ones(B, np.float32),
        frequency_penalty=np.zeros(B, np.float32),
        presence_penalty=np.zeros(B, np.float32),
        do_sample=np.zeros(B, bool),
        seeds=np.arange(B, dtype=np.uint32),
        bad_words_mask=None,
        max_top_logprobs=0,
    )
    base.update(over)
    return SamplingInputs(**base)


def test_greedy_argmax():
    B, V = 4, 32
    rng = np.random.RandomState(0)
    logits = rng.randn(B, V).astype(np.float32)
    counts = jnp.zeros((B, V), jnp.int16)
    tokens, lp, _ = sample_logits(jnp.asarray(logits), make_inputs(B, V), counts)
    np.testing.assert_array_equal(np.asarray(tokens), logits.argmax(-1))
    assert np.all(np.asarray(lp) <= 0)


def test_top_k_restricts_support():
    B, V = 2, 64
    rng = np.random.RandomState(1)
    logits = rng.randn(B, V).astype(np.float32)
    top5 = np.argsort(logits, axis=-1)[:, -5:]
    inputs = make_inputs(B, V, top_k=np.full(B, 5, np.int32),
                         do_sample=np.ones(B, bool),
                         temperature=np.full(B, 1.5, np.float32))
    counts = jnp.zeros((B, V), jnp.int16)
    for seed in range(10):
        inputs.seeds = np.full(B, seed, np.uint32)
        tokens, _, _ = sample_logits(jnp.asarray(logits), inputs, counts)
        for b in range(B):
            assert int(tokens[b]) in top5[b]


def test_top_p_keeps_argmax():
    B, V = 3, 50
    rng = np.random.RandomState(2)
    logits = (rng.randn(B, V) * 3).astype(np.float32)
    inputs = make_inputs(B, V, top_p=np.full(B, 0.01, np.float32),
                         do_sample=np.ones(B, bool))
    counts = jnp.zeros((B, V), jnp.int16)
    tokens, _, _ = sample_logits(jnp.asarray(logits), inputs, counts)
    # tiny top_p must degenerate to argmax
    np.testing.assert_array_equal(np.asarray(tokens), logits.argmax(-1))


def test_repetition_penalty_reduces_repeat_prob():
    B, V = 1, 16
    logits = np.zeros((B, V), np.float32)
    logits[0, 3] = 2.0
    logits[0, 5] = 1.9
    counts = jnp.zeros((B, V), jnp.int16).at[0, 3].set(4)
    inputs = make_inputs(B, V, repetition_penalty=np.full(B, 10.0, np.float32))
    tokens, _, _ = sample_logits(jnp.asarray(logits), inputs, counts)
    assert int(tokens[0]) == 5   # penalized token 3 loses to 5


def test_frequency_presence_penalties():
    B, V = 1, 8
    logits = np.zeros((B, V), np.float32)
    logits[0, 2] = 1.0
    logits[0, 6] = 0.9
    counts = jnp.zeros((B, V), jnp.int16).at[0, 2].set(3)
    inputs = make_inputs(B, V, frequency_penalty=np.full(B, 0.5, np.float32))
    tokens, _, _ = sample_logits(jnp.asarray(logits), inputs, counts)
    assert int(tokens[0]) == 6   # 1.0 - 3*0.5 < 0.9


def test_bad_words_banned():
    B, V = 2, 16
    logits = np.zeros((B, V), np.float32)
    logits[:, 0] = 5.0
    logits[:, 1] = 4.0
    mask = np.zeros((B, V), bool)
    mask[:, 0] = True
    inputs = make_inputs(B, V, bad_words_mask=mask)
    counts = jnp.zeros((B, V), jnp.int16)
    tokens, _, _ = sample_logits(jnp.asarray(logits), inputs, counts)
    np.testing.assert_array_equal(np.asarray(tokens), [1, 1])


def test_per_row_mixed_modes():
    """Row 0 greedy, row 1 sampled with top_k=1 => both deterministic."""
    B, V = 2, 32
    rng = np.random.RandomState(3)
    logits = rng.randn(B, V).astype(np.float32)
    inputs = make_inputs(B, V, do_sample=np.array([False, True]),
                         top_k=np.array([0, 1], np.int32))
    counts = jnp.zeros((B, V), jnp.int16)
    tokens, _, _ = sample_logits(jnp.asarray(logits), inputs, counts)
    np.testing.assert_array_equal(np.asarray(tokens), logits.argmax(-1))


def test_logprobs_capture():
    B, V = 2, 16
    rng = np.random.RandomState(4)
    logits = rng.randn(B, V).astype(np.float32)
    inputs = make_inputs(B, V, max_top_logprobs=3)
    counts = jnp.zeros((B, V), jnp.int16)
    tokens, lp, (top_vals, top_ids) = sample_logits(jnp.asarray(logits), inputs, counts)
    assert top_vals.shape == (B, 3) and top_ids.shape == (B, 3)
    # greedy token's logprob equals the top-1 logprob
    np.testing.assert_allclose(np.asarray(lp), np.asarray(top_vals)[:, 0], rtol=1e-5)
