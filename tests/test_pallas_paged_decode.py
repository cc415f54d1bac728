"""Pallas paged-decode kernels vs the XLA gather reference (interpret mode).

Covers the unified-page layout (ops/attention.py kv_row_width): bf16/f32
pages, int8 pages + scale DMA, int4 token-pair-packed pages.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmdeploy_tpu.ops.attention import (attention_dense_gathered,
                                        gather_layer_kv, kv_row_width,
                                        plane_rows)
from lmdeploy_tpu.ops.kv_quant import (QuantKV, QuantKV4, quantize_rows,
                                       quantize_rows_int4)
from lmdeploy_tpu.ops.pallas import paged_decode

L, LAYER = 3, 1   # multi-layer cache; kernel must read exactly layer 1


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    """Run the kernel in the pallas interpreter on CPU."""
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        yield


def make_dense_cache(rng, Hkv, NB, BS, D):
    """Unified plane pages [L, NB, 2, BS, HDp] from random dense K/V."""
    _, hdp = kv_row_width(Hkv, D)
    k = rng.randn(L, NB, BS, Hkv, D).astype(np.float32)
    v = rng.randn(L, NB, BS, Hkv, D).astype(np.float32)
    kr = plane_rows(jnp.asarray(k.reshape(-1, Hkv, D)), hdp)
    vr = plane_rows(jnp.asarray(v.reshape(-1, Hkv, D)), hdp)
    return jnp.stack([kr.reshape(L, NB, BS, hdp),
                      vr.reshape(L, NB, BS, hdp)], axis=2)


def reference(q, kv_cache, tables, kv_lens, scale, Hkv, D, softcap=None):
    k, v = gather_layer_kv(kv_cache, jnp.int32(LAYER), jnp.asarray(tables),
                           Hkv, D)
    return attention_dense_gathered(q[:, None], k, v,
                                    jnp.asarray(kv_lens - 1),
                                    scale, logit_softcap=softcap)[:, 0]


@pytest.mark.parametrize('lens', [[1], [64], [65], [37, 128, 1, 200]])
@pytest.mark.parametrize('G', [1, 4])
def test_decode_matches_reference(lens, G):
    rng = np.random.RandomState(0)
    B = len(lens)
    Hkv, D, BS = 2, 64, 16
    NB, W = 128, 16

    kv_cache = make_dense_cache(rng, Hkv, NB, BS, D)
    tables = rng.permutation(np.arange(1, NB))[:B * W].reshape(B, W).astype(np.int32)
    q = jnp.asarray(rng.randn(B, Hkv * G, D).astype(np.float32))
    kv_lens = np.asarray(lens, np.int32)
    scale = D ** -0.5

    out = paged_decode.paged_decode_attention(
        q, kv_cache, jnp.asarray(tables), jnp.asarray(kv_lens),
        jnp.int32(LAYER), scale, Hkv)
    out = np.asarray(out)   # sync before eager reference (interpret-mode race)

    ref = reference(q, kv_cache, tables, kv_lens, scale, Hkv, D)
    np.testing.assert_allclose(out, np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_decode_inactive_rows_finite():
    rng = np.random.RandomState(1)
    B, Hkv, G, D, BS, NB, W = 2, 2, 2, 32, 16, 16, 4
    kv_cache = make_dense_cache(rng, Hkv, NB, BS, D)
    tables = np.ones((B, W), np.int32)
    q = jnp.asarray(rng.randn(B, Hkv * G, D).astype(np.float32))
    kv_lens = np.asarray([10, 0], np.int32)   # row 1 inactive
    out = np.asarray(paged_decode.paged_decode_attention(
        q, kv_cache, jnp.asarray(tables), jnp.asarray(kv_lens),
        jnp.int32(LAYER), 0.2, Hkv))
    assert np.isfinite(out).all()
    ref = reference(q, kv_cache, tables, np.asarray([10, 1], np.int32), 0.2,
                    Hkv, D)
    np.testing.assert_allclose(out[0], np.asarray(ref)[0], rtol=2e-5, atol=2e-5)


def test_decode_softcap():
    rng = np.random.RandomState(2)
    B, Hkv, G, D, BS, NB, W = 1, 1, 2, 32, 16, 16, 4
    kv_cache = make_dense_cache(rng, Hkv, NB, BS, D)
    tables = np.arange(1, 1 + B * W, dtype=np.int32).reshape(B, W)
    q = jnp.asarray(rng.randn(B, Hkv * G, D).astype(np.float32))
    kv_lens = np.asarray([50], np.int32)
    out = np.asarray(paged_decode.paged_decode_attention(
        q, kv_cache, jnp.asarray(tables), jnp.asarray(kv_lens),
        jnp.int32(LAYER), 0.2, Hkv, logit_softcap=30.0))
    ref = reference(q, kv_cache, tables, kv_lens, 0.2, Hkv, D, softcap=30.0)
    np.testing.assert_allclose(out, np.asarray(ref), rtol=2e-5, atol=2e-5)


def make_int8_cache(rng, Hkv, NB, BS, D):
    """QuantKV with per-(token, head) scales from random dense K/V."""
    _, hdp = kv_row_width(Hkv, D)
    k = rng.randn(L, NB, BS, Hkv, D).astype(np.float32)
    v = rng.randn(L, NB, BS, Hkv, D).astype(np.float32)
    kq, ksc = quantize_rows(jnp.asarray(k))          # [L,NB,BS,Hkv]
    vq, vsc = quantize_rows(jnp.asarray(v))
    kr = plane_rows(jnp.asarray(np.asarray(kq).reshape(-1, Hkv, D)), hdp)
    vr = plane_rows(jnp.asarray(np.asarray(vq).reshape(-1, Hkv, D)), hdp)
    data = jnp.stack([kr.reshape(L, NB, BS, hdp),
                      vr.reshape(L, NB, BS, hdp)], axis=2).astype(jnp.int8)
    # scales token-major [L, NB, 2, BS, Hkv] (round 5: the fill row-scatters
    # per-token [Hkv] rows; the kernel wrapper transposes the current layer)
    sc = jnp.stack([ksc, vsc], axis=2)
    return QuantKV(data, sc)


@pytest.mark.parametrize('lens', [[1], [64], [37, 128, 1, 200]])
@pytest.mark.parametrize('G', [1, 4])
def test_quant_decode_matches_reference(lens, G):
    """int8-KV decode kernel (scale DMA + score-side dequant) vs the
    gather+dequant XLA reference."""
    rng = np.random.RandomState(2)
    B = len(lens)
    Hkv, D, BS = 2, 64, 16
    NB, W = 128, 16

    kv_cache = make_int8_cache(rng, Hkv, NB, BS, D)
    tables = rng.permutation(np.arange(1, NB))[:B * W].reshape(B, W).astype(np.int32)
    q = jnp.asarray(rng.randn(B, Hkv * G, D).astype(np.float32))
    kv_lens = np.asarray(lens, np.int32)
    scale = D ** -0.5

    out = np.asarray(paged_decode.paged_decode_attention(
        q, kv_cache, jnp.asarray(tables), jnp.asarray(kv_lens),
        jnp.int32(LAYER), scale, Hkv))
    ref = reference(q, kv_cache, tables, kv_lens, scale, Hkv, D)
    np.testing.assert_allclose(out, np.asarray(ref), rtol=2e-4, atol=2e-4)


def make_int4_cache(rng, Hkv, NB, BS, D):
    """QuantKV4 (token-pair packed, de-interleaved scales) from dense K/V."""
    _, hdp = kv_row_width(Hkv, D)
    k = rng.randn(L, NB, BS, Hkv, D).astype(np.float32)
    v = rng.randn(L, NB, BS, Hkv, D).astype(np.float32)
    kq, ksc, kmn = quantize_rows_int4(jnp.asarray(k))
    vq, vsc, vmn = quantize_rows_int4(jnp.asarray(v))
    kr = np.asarray(plane_rows(
        jnp.asarray(np.asarray(kq).reshape(-1, Hkv, D)), hdp))
    vr = np.asarray(plane_rows(
        jnp.asarray(np.asarray(vq).reshape(-1, Hkv, D)), hdp))
    rows = np.stack([kr.reshape(L, NB, BS, hdp),
                     vr.reshape(L, NB, BS, hdp)], axis=2)  # [L,NB,2,BS,HDp]
    packed = (rows[:, :, :, 0::2] | (rows[:, :, :, 1::2] << 4)).astype(np.uint8)

    def deint(x):                                    # [L,NB,BS,Hkv] -> deint
        x = np.moveaxis(np.asarray(x), 3, 2)         # [L,NB,Hkv,BS]
        return np.concatenate([x[..., 0::2], x[..., 1::2]], axis=-1)

    sc = np.stack([deint(ksc), deint(vsc)], axis=2)  # [L,NB,2,Hkv,BS]
    mn = np.stack([deint(kmn), deint(vmn)], axis=2)
    return QuantKV4(jnp.asarray(packed), jnp.asarray(sc), jnp.asarray(mn))


@pytest.mark.parametrize('lens', [[1], [64], [37, 128, 1, 200]])
@pytest.mark.parametrize('G', [1, 4])
def test_quant4_decode_matches_reference(lens, G):
    """int4-KV decode kernel vs the gather+dequant reference path."""
    rng = np.random.RandomState(3)
    B = len(lens)
    Hkv, D, BS = 2, 64, 16
    NB, W = 128, 16

    kv_cache = make_int4_cache(rng, Hkv, NB, BS, D)
    tables = rng.permutation(np.arange(1, NB))[:B * W].reshape(B, W).astype(np.int32)
    q = jnp.asarray(rng.randn(B, Hkv * G, D).astype(np.float32))
    kv_lens = np.asarray(lens, np.int32)
    scale = D ** -0.5

    out = np.asarray(paged_decode.paged_decode_attention(
        q, kv_cache, jnp.asarray(tables), jnp.asarray(kv_lens),
        jnp.int32(LAYER), scale, Hkv))
    ref = reference(q, kv_cache, tables, kv_lens, scale, Hkv, D)
    np.testing.assert_allclose(out, np.asarray(ref), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize('window', [8, 24, 40, 1000])
def test_decode_sliding_window(window):
    """Windowed decode must match the reference mask, including windows that
    start mid-page and windows wider than the context (no-ops)."""
    rng = np.random.RandomState(5)
    B, Hkv, G, D, BS = 3, 2, 4, 32, 16
    NB, W = 64, 8
    kv_cache = make_dense_cache(rng, Hkv, NB, BS, D)
    tables = rng.permutation(np.arange(1, NB))[:B * W].reshape(B, W).astype(np.int32)
    q = jnp.asarray(rng.randn(B, Hkv * G, D).astype(np.float32))
    kv_lens = np.asarray([5, 64, 100], np.int32)
    scale = D ** -0.5

    out = np.asarray(paged_decode.paged_decode_attention(
        q, kv_cache, jnp.asarray(tables), jnp.asarray(kv_lens),
        jnp.int32(LAYER), scale, Hkv, window=window))

    k, v = gather_layer_kv(kv_cache, jnp.int32(LAYER), jnp.asarray(tables),
                           Hkv, D)
    ref = attention_dense_gathered(q[:, None], k, v, jnp.asarray(kv_lens - 1),
                                   scale, window_size=window)[:, 0]
    np.testing.assert_allclose(out, np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_decode_traced_window_and_sinks():
    """gpt-oss style: per-layer TRACED window + learned sink logits."""
    rng = np.random.RandomState(6)
    B, Hkv, G, D, BS = 2, 2, 2, 32, 16
    NB, W = 32, 4
    kv_cache = make_dense_cache(rng, Hkv, NB, BS, D)
    tables = rng.permutation(np.arange(1, NB))[:B * W].reshape(B, W).astype(np.int32)
    q = jnp.asarray(rng.randn(B, Hkv * G, D).astype(np.float32))
    kv_lens = np.asarray([30, 50], np.int32)
    sinks = jnp.asarray(rng.randn(Hkv * G).astype(np.float32))
    scale = D ** -0.5

    for win in (jnp.int32(12), jnp.int32(0)):     # traced scalars
        out = np.asarray(paged_decode.paged_decode_attention(
            q, kv_cache, jnp.asarray(tables), jnp.asarray(kv_lens),
            jnp.int32(LAYER), scale, Hkv, window=win, sinks=sinks))
        k, v = gather_layer_kv(kv_cache, jnp.int32(LAYER),
                               jnp.asarray(tables), Hkv, D)
        ref = attention_dense_gathered(
            q[:, None], k, v, jnp.asarray(kv_lens - 1), scale,
            window_size=win, sinks=sinks)[:, 0]
        np.testing.assert_allclose(out, np.asarray(ref), rtol=2e-5, atol=2e-5)


# -- context-parallel decode (shard_map partial kernel + cross-'cp' combine) ----------

def _cp_mesh(cp=2):
    from lmdeploy_tpu.parallel.mesh import build_mesh
    return build_mesh(cp=cp, devices=jax.devices()[:cp])


@pytest.mark.parametrize('lens', [[1], [37, 128, 1, 200]])
def test_cp_decode_matches_unsharded(lens):
    """Striped-KV partial kernel + (m, l, acc) combine == unsharded kernel."""
    from jax.sharding import NamedSharding

    from lmdeploy_tpu.parallel.mesh import cache_sharding

    rng = np.random.RandomState(10)
    B = len(lens)
    Hkv, G, D, BS = 2, 4, 64, 16
    NB, W = 128, 16
    kv_cache = make_dense_cache(rng, Hkv, NB, BS, D)
    tables = rng.permutation(np.arange(1, NB))[:B * W].reshape(B, W).astype(np.int32)
    q = jnp.asarray(rng.randn(B, Hkv * G, D).astype(np.float32))
    kv_lens = np.asarray(lens, np.int32)
    scale = D ** -0.5

    base = np.asarray(paged_decode.paged_decode_attention(
        q, kv_cache, jnp.asarray(tables), jnp.asarray(kv_lens),
        jnp.int32(LAYER), scale, Hkv))

    mesh = _cp_mesh(2)
    kc = jax.device_put(kv_cache, NamedSharding(mesh, cache_sharding(Hkv, cp=2)))
    got = np.asarray(paged_decode.paged_decode_attention_cp(
        q, kc, jnp.asarray(tables), jnp.asarray(kv_lens),
        jnp.int32(LAYER), scale, Hkv, mesh, interpret=True))
    np.testing.assert_allclose(got, base, rtol=2e-5, atol=2e-5)


def test_cp_decode_window_and_sinks():
    """CP decode with a traced sliding window + sink logits (gpt-oss long-KV
    shape): sinks must enter the denominator once globally, not per rank."""
    from jax.sharding import NamedSharding

    from lmdeploy_tpu.parallel.mesh import cache_sharding

    rng = np.random.RandomState(11)
    B, Hkv, G, D, BS = 2, 2, 2, 32, 16
    NB, W = 32, 4
    kv_cache = make_dense_cache(rng, Hkv, NB, BS, D)
    tables = rng.permutation(np.arange(1, NB))[:B * W].reshape(B, W).astype(np.int32)
    q = jnp.asarray(rng.randn(B, Hkv * G, D).astype(np.float32))
    kv_lens = np.asarray([30, 50], np.int32)
    sinks = jnp.asarray(rng.randn(Hkv * G).astype(np.float32))
    scale = D ** -0.5

    mesh = _cp_mesh(2)
    kc = jax.device_put(kv_cache, NamedSharding(mesh, cache_sharding(Hkv, cp=2)))
    for win in (jnp.int32(12), None):
        k, v = gather_layer_kv(kv_cache, jnp.int32(LAYER),
                               jnp.asarray(tables), Hkv, D)
        ref = attention_dense_gathered(
            q[:, None], k, v, jnp.asarray(kv_lens - 1), scale,
            window_size=win if win is not None else None, sinks=sinks)[:, 0]
        got = np.asarray(paged_decode.paged_decode_attention_cp(
            q, kc, jnp.asarray(tables), jnp.asarray(kv_lens),
            jnp.int32(LAYER), scale, Hkv, mesh, window=win, sinks=sinks,
            interpret=True))
        np.testing.assert_allclose(got, np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize('lens', [[64], [37, 128, 1, 200]])
def test_turbo_decode_matches_gather_reference(lens):
    """TurboQuant k4v2 kernel (planar codes, arithmetic centroid decode,
    score-side norms) vs the XLA gather+dequant reference — identical up to
    f32 accumulation order."""
    from lmdeploy_tpu.ops.attention import compute_slot_mapping, fill_kv_cache
    from lmdeploy_tpu.ops.kv_quant import QuantKVTurbo, hadamard_rotate

    rng = np.random.RandomState(5)
    B = len(lens)
    Hkv, D, BS = 2, 128, 16          # Hkv*D = 256 (kernel alignment gate)
    G = 4
    NB, W = 96, 16
    rowt = Hkv * D // 2

    cache = QuantKVTurbo(jnp.zeros((L, NB, 2, BS, rowt), jnp.uint8),
                         jnp.zeros((L, NB, 2, 2, Hkv, BS), jnp.float32))
    tables = rng.permutation(np.arange(1, NB))[:B * W].reshape(
        B, W).astype(np.int32)
    # fill each row's context through the real fill path
    for b, n in enumerate(lens):
        slots = compute_slot_mapping(
            jnp.asarray(tables[b:b + 1]), jnp.asarray([0], jnp.int32),
            jnp.asarray([n], jnp.int32), n, BS)
        k = jnp.asarray(rng.randn(n, Hkv, D), jnp.float32)
        v = jnp.asarray(rng.randn(n, Hkv, D), jnp.float32)
        cache = fill_kv_cache(cache, k, v, slots, jnp.int32(LAYER))

    q = jnp.asarray(rng.randn(B, Hkv * G, D).astype(np.float32))
    q_rot = hadamard_rotate(q.reshape(B, Hkv * G, D)).astype(jnp.float32)
    kv_lens = np.asarray(lens, np.int32)
    scale = D ** -0.5

    out = paged_decode.paged_decode_attention(
        q_rot, cache, jnp.asarray(tables), jnp.asarray(kv_lens),
        jnp.int32(LAYER), scale, Hkv)
    out = np.asarray(out)

    k_g, v_g = gather_layer_kv(cache, jnp.int32(LAYER), jnp.asarray(tables),
                               Hkv, D)
    ref = attention_dense_gathered(q_rot[:, None], k_g, v_g,
                                   jnp.asarray(kv_lens - 1), scale)[:, 0]
    np.testing.assert_allclose(out, np.asarray(ref), rtol=2e-4, atol=2e-4)
