"""Speculative rejection sampler: correctness + distribution preservation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmdeploy_tpu.ops.spec_sampling import expected_acceptance_rate, reject_sample


def test_identical_distributions_accept_all():
    """Draft == target => every draft token accepted + one bonus token."""
    B, K, V = 4, 3, 16
    rng = np.random.RandomState(0)
    logits = rng.randn(B, K + 1, V).astype(np.float32)
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    draft = probs[:, :K]
    # draft tokens sampled anywhere — ratio = 1 => always accepted
    draft_tokens = rng.randint(0, V, (B, K)).astype(np.int32)
    out, n = reject_sample(jnp.asarray(probs), jnp.asarray(draft),
                           jnp.asarray(draft_tokens), jax.random.PRNGKey(0))
    assert np.all(np.asarray(n) == K + 1)
    np.testing.assert_array_equal(np.asarray(out)[:, :K], draft_tokens)


def test_disjoint_distributions_reject_first():
    """Draft puts mass where target has none => first token always rejected."""
    B, K, V = 2, 2, 8
    target = np.zeros((B, K + 1, V), np.float32)
    target[..., :4] = 0.25           # target on tokens 0..3
    draft = np.zeros((B, K, V), np.float32)
    draft[..., 4:] = 0.25            # draft on tokens 4..7
    draft_tokens = np.full((B, K), 5, np.int32)
    out, n = reject_sample(jnp.asarray(target), jnp.asarray(draft),
                           jnp.asarray(draft_tokens), jax.random.PRNGKey(1))
    assert np.all(np.asarray(n) == 1)
    assert np.all(np.asarray(out)[:, 0] < 4)   # resampled from target support


def test_output_distribution_matches_target():
    """Chained accept/resample must reproduce the target marginal at position 0."""
    V, K = 4, 1
    target = np.asarray([[0.5, 0.3, 0.1, 0.1]], np.float32)
    draft = np.asarray([[0.1, 0.2, 0.4, 0.3]], np.float32)
    N = 4000
    counts = np.zeros(V)
    key = jax.random.PRNGKey(42)
    # draft tokens ~ draft distribution
    keys = jax.random.split(key, N + 1)
    draft_toks = np.asarray(jax.vmap(
        lambda k: jax.random.choice(k, V, p=jnp.asarray(draft[0])))(keys[1:]))
    tgt = jnp.asarray(np.repeat(target[None], 1, 0).reshape(1, 1, V))
    tgt2 = jnp.concatenate([tgt, tgt], axis=1)       # [1, K+1=2, V]
    for i in range(N):
        out, n = reject_sample(tgt2, jnp.asarray(draft[None]),
                               jnp.asarray([[draft_toks[i]]], np.int32),
                               keys[i])
        counts[int(np.asarray(out)[0, 0])] += 1
    freq = counts / N
    np.testing.assert_allclose(freq, target[0], atol=0.04)


def test_acceptance_rate_diag():
    B, K, V = 1, 1, 4
    t = jnp.asarray([[[0.5, 0.5, 0.0, 0.0], [0.25] * 4]])
    d = jnp.asarray([[[0.0, 0.0, 0.5, 0.5]]])
    rate = expected_acceptance_rate(t, d)
    assert float(rate[0, 0]) == pytest.approx(0.0)
    d2 = jnp.asarray([[[0.5, 0.5, 0.0, 0.0]]])
    assert float(expected_acceptance_rate(t, d2)[0, 0]) == pytest.approx(1.0)
