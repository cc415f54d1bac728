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


@pytest.mark.parametrize('lens', [[1], [64], [37, 128, 1, 200]])
@pytest.mark.parametrize('G', [1, 4])
def test_quant_decode_matches_reference(lens, G):
    """int8-KV decode kernel (scale-DMA + score-side dequant) vs the
    gather+dequant XLA reference."""
    from lmdeploy_tpu.ops.kv_quant import QuantKV, quantize_rows

    rng = np.random.RandomState(2)
    B = len(lens)
    Hkv, D, BS = 2, 64, 16
    Hq = Hkv * G
    NB = 128
    W = 16

    k_f = rng.randn(L, Hkv, NB, BS, D).astype(np.float32)
    v_f = rng.randn(L, Hkv, NB, BS, D).astype(np.float32)
    k_q, k_sc = quantize_rows(jnp.asarray(k_f))
    v_q, v_sc = quantize_rows(jnp.asarray(v_f))
    k_cache = QuantKV(k_q, k_sc)
    v_cache = QuantKV(v_q, v_sc)
    tables = rng.permutation(np.arange(1, NB))[:B * W].reshape(B, W).astype(np.int32)
    q = jnp.asarray(rng.randn(B, Hq, D).astype(np.float32))
    kv_lens = np.asarray(lens, np.int32)
    scale = D ** -0.5

    out = paged_decode.paged_decode_attention_quant(
        q, k_cache, v_cache, jnp.asarray(tables), jnp.asarray(kv_lens),
        jnp.int32(LAYER), scale)
    # materialize before launching eager XLA work: interpret-mode execution is
    # async and racing it with large eager dispatches can deadlock (observed
    # with this kernel's 4-semaphore DMA pattern)
    out = np.asarray(out)

    ref = paged_attention_reference(
        q[:, None], k_q[LAYER], v_q[LAYER], jnp.asarray(tables),
        jnp.asarray(kv_lens - 1), jnp.ones(B, jnp.int32), scale,
        k_scale=k_sc[LAYER], v_scale=v_sc[LAYER])[:, 0]

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4,
                               atol=2e-4)


@pytest.mark.parametrize('lens', [[1], [64], [37, 128, 1, 200]])
@pytest.mark.parametrize('G', [1, 4])
def test_quant4_decode_matches_reference(lens, G):
    """int4-KV decode kernel vs the gather+dequant reference path."""
    from lmdeploy_tpu.ops.attention import (attention_dense_gathered,
                                            gather_dequant_kv4)
    from lmdeploy_tpu.ops.kv_quant import QuantKV4, deint_scale_pos, \
        quantize_rows_int4

    rng = np.random.RandomState(3)
    B = len(lens)
    Hkv, D, BS = 2, 64, 16
    Hq = Hkv * G
    NB = 128
    W = 16

    # build a fully-populated int4 cache directly (deint scale order)
    k_f = rng.randn(L, Hkv, NB, BS, D).astype(np.float32)
    v_f = rng.randn(L, Hkv, NB, BS, D).astype(np.float32)

    def make(x):
        q, sc, mn = quantize_rows_int4(jnp.asarray(x))
        q = np.asarray(q)
        lo = q[:, :, :, 0::2]                    # even slots
        hi = q[:, :, :, 1::2]
        packed = (lo | (hi << 4)).astype(np.uint8)    # [L,H,NB,BS/2,D]
        # scales in de-interleaved page order [even | odd]
        sc = np.asarray(sc); mn = np.asarray(mn)
        sc_d = np.concatenate([sc[..., 0::2], sc[..., 1::2]], axis=-1)
        mn_d = np.concatenate([mn[..., 0::2], mn[..., 1::2]], axis=-1)
        return QuantKV4(jnp.asarray(packed), jnp.asarray(sc_d),
                        jnp.asarray(mn_d))

    k_cache = make(k_f)
    v_cache = make(v_f)
    tables = rng.permutation(np.arange(1, NB))[:B * W].reshape(B, W).astype(np.int32)
    q = jnp.asarray(rng.randn(B, Hq, D).astype(np.float32))
    kv_lens = np.asarray(lens, np.int32)
    scale = D ** -0.5

    out = paged_decode.paged_decode_attention_quant4(
        q, k_cache, v_cache, jnp.asarray(tables), jnp.asarray(kv_lens),
        jnp.int32(LAYER), scale)
    out = np.asarray(out)     # sync before eager ref (interpret-mode race)

    k = gather_dequant_kv4(k_cache, jnp.int32(LAYER), jnp.asarray(tables))
    v = gather_dequant_kv4(v_cache, jnp.int32(LAYER), jnp.asarray(tables))
    ref = attention_dense_gathered(
        q[:, None], k, v, jnp.asarray(kv_lens - 1), scale)[:, 0]

    np.testing.assert_allclose(out, np.asarray(ref), rtol=2e-4, atol=2e-4)
