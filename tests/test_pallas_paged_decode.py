"""Pallas paged-decode kernel vs the XLA reference (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmdeploy_tpu.ops.attention import paged_attention_reference
from lmdeploy_tpu.ops.pallas import paged_decode

L, LAYER = 3, 1   # multi-layer cache; kernel must read exactly layer 1


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    """Run the kernel in the pallas interpreter on CPU."""
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        yield


@pytest.mark.parametrize('lens', [[1], [64], [65], [37, 128, 1, 200]])
@pytest.mark.parametrize('G', [1, 4])
def test_decode_matches_reference(lens, G):
    rng = np.random.RandomState(0)
    B = len(lens)
    Hkv, D, BS = 2, 64, 16
    Hq = Hkv * G
    NB = 128
    W = 16

    k_cache = jnp.asarray(rng.randn(L, Hkv, NB, BS, D).astype(np.float32))
    v_cache = jnp.asarray(rng.randn(L, Hkv, NB, BS, D).astype(np.float32))
    tables = rng.permutation(np.arange(1, NB))[:B * W].reshape(B, W).astype(np.int32)
    q = jnp.asarray(rng.randn(B, Hq, D).astype(np.float32))
    kv_lens = np.asarray(lens, np.int32)
    scale = D ** -0.5

    out = paged_decode.paged_decode_attention(
        q, k_cache, v_cache, jnp.asarray(tables), jnp.asarray(kv_lens),
        jnp.int32(LAYER), scale, pages_per_blk=2)

    ref = paged_attention_reference(
        q[:, None], k_cache[LAYER], v_cache[LAYER], jnp.asarray(tables),
        jnp.asarray(kv_lens - 1), jnp.ones(B, jnp.int32), scale)[:, 0]

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_decode_inactive_rows_zero():
    rng = np.random.RandomState(1)
    B, Hkv, G, D, BS, NB, W = 2, 2, 2, 32, 16, 16, 4
    k_cache = jnp.asarray(rng.randn(L, Hkv, NB, BS, D).astype(np.float32))
    v_cache = jnp.asarray(rng.randn(L, Hkv, NB, BS, D).astype(np.float32))
    tables = np.ones((B, W), np.int32)
    q = jnp.asarray(rng.randn(B, Hkv * G, D).astype(np.float32))
    kv_lens = np.asarray([10, 0], np.int32)   # row 1 inactive
    out = paged_decode.paged_decode_attention(
        q, k_cache, v_cache, jnp.asarray(tables), jnp.asarray(kv_lens),
        jnp.int32(LAYER), 0.2)
    assert np.asarray(out)[1].sum() == 0.0
    assert np.abs(np.asarray(out)[0]).sum() > 0


def test_decode_softcap():
    rng = np.random.RandomState(2)
    B, Hkv, G, D, BS, NB, W = 1, 1, 2, 32, 16, 16, 4
    k_cache = jnp.asarray(rng.randn(L, Hkv, NB, BS, D).astype(np.float32))
    v_cache = jnp.asarray(rng.randn(L, Hkv, NB, BS, D).astype(np.float32))
    tables = np.arange(1, 1 + B * W, dtype=np.int32).reshape(B, W)
    q = jnp.asarray(rng.randn(B, Hkv * G, D).astype(np.float32))
    kv_lens = np.asarray([50], np.int32)
    out = paged_decode.paged_decode_attention(
        q, k_cache, v_cache, jnp.asarray(tables), jnp.asarray(kv_lens),
        jnp.int32(LAYER), 0.2, logit_softcap=30.0)
    ref = paged_attention_reference(
        q[:, None], k_cache[LAYER], v_cache[LAYER], jnp.asarray(tables),
        jnp.asarray(kv_lens - 1), jnp.ones(B, jnp.int32), 0.2,
        logit_softcap=30.0)[:, 0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
