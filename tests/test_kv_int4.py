"""Token-pair-packed int4 KV cache (quant_policy=8) tests — unified layout."""
import numpy as np
import pytest

import jax.numpy as jnp


def test_quantize_int4_roundtrip():
    from lmdeploy_tpu.ops.kv_quant import dequantize_int4, quantize_rows_int4

    rng = np.random.RandomState(0)
    x = rng.randn(7, 2, 64).astype(np.float32) * 3.0
    q, s, mn = quantize_rows_int4(jnp.asarray(x))
    back = np.asarray(dequantize_int4(q, s, mn))
    err = np.abs(back - x)
    bound = np.asarray(s)[..., None] * 0.51 + 1e-5
    assert (err <= bound).all()
    assert np.asarray(q).max() <= 15 and np.asarray(q).min() >= 0


def _q4(L, Hkv, NB, BS, D):
    from lmdeploy_tpu.ops.attention import kv_row_width
    from lmdeploy_tpu.ops.kv_quant import QuantKV4
    _, rowp = kv_row_width(Hkv, D)
    return QuantKV4(jnp.zeros((L, NB, 2, BS // 2, rowp), jnp.uint8),
                    jnp.zeros((L, NB, 2, Hkv, BS), jnp.float32),
                    jnp.zeros((L, NB, 2, Hkv, BS), jnp.float32))


def _filled_cache(rng, L, Hkv, NB, BS, D, B, T, tables, history, q_lens):
    from lmdeploy_tpu.ops.attention import compute_slot_mapping, fill_kv_cache

    slot = compute_slot_mapping(jnp.asarray(tables), jnp.asarray(history),
                                jnp.asarray(q_lens), T, BS)
    k_new = rng.randn(B * T, Hkv, D).astype(np.float32)
    v_new = rng.randn(B * T, Hkv, D).astype(np.float32)
    layer = jnp.int32(1)
    kv = fill_kv_cache(_q4(L, Hkv, NB, BS, D), jnp.asarray(k_new),
                       jnp.asarray(v_new), slot, layer)
    return kv, k_new, v_new, slot, layer


def test_fill_and_gather_dequant_roundtrip():
    """fill_kv_cache into a QuantKV4 cache, then gather_layer_kv must
    reconstruct the written rows within one quant step."""
    from lmdeploy_tpu.ops.attention import gather_layer_kv

    rng = np.random.RandomState(1)
    L, Hkv, NB, BS, D = 2, 2, 8, 16, 64
    B, T = 2, 8
    tables = np.asarray([[1, 2, 0, 0], [3, 4, 0, 0]], np.int32)
    history = np.zeros(B, np.int32)
    q_lens = np.full(B, T, np.int32)
    kv, k_new, v_new, slot, layer = _filled_cache(
        rng, L, Hkv, NB, BS, D, B, T, tables, history, q_lens)

    k, v = gather_layer_kv(kv, layer, jnp.asarray(tables), Hkv, D)
    k = np.asarray(k)   # [Hkv, B, S, D]
    k_new_b = k_new.reshape(B, T, Hkv, D)
    for b in range(B):
        for t in range(T):
            for h in range(Hkv):
                got = k[h, b, t]
                want = k_new_b[b, t, h]
                step = (want.max() - want.min()) / 15 + 1e-6
                assert np.abs(got - want).max() <= step * 0.51 + 1e-5


def test_fill_and_attention_int4_matches_manual_dequant():
    from lmdeploy_tpu.ops.attention import (attention_dense_gathered,
                                            gather_layer_kv, paged_attention)

    rng = np.random.RandomState(2)
    L, Hkv, NB, BS, D = 2, 2, 8, 16, 64
    B, T, Hq = 2, 8, 4
    tables = np.asarray([[1, 2, 0, 0], [3, 4, 0, 0]], np.int32)
    history = np.zeros(B, np.int32)
    q_lens = np.full(B, T, np.int32)
    kv, k_new, v_new, slot, layer = _filled_cache(
        rng, L, Hkv, NB, BS, D, B, T, tables, history, q_lens)

    q = rng.randn(B, T, Hq, D).astype(np.float32)
    got = paged_attention(jnp.asarray(q), kv, jnp.asarray(tables),
                          jnp.asarray(history), jnp.asarray(q_lens),
                          0.125, layer, Hkv)
    k, v = gather_layer_kv(kv, layer, jnp.asarray(tables), Hkv, D)
    want = attention_dense_gathered(jnp.asarray(q), k, v, jnp.asarray(history),
                                    0.125)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pair_write_no_clobber():
    """Adjacent even/odd slots written in ONE fill call must both survive
    (the nibble-merge scatter runs in two parity rounds)."""
    from lmdeploy_tpu.ops.attention import fill_kv_cache, gather_layer_kv

    L, Hkv, NB, BS, D = 1, 1, 4, 8, 128
    # tokens at slots 8+0..8+3 of block 1 (pairs (0,1), (2,3))
    slot = jnp.asarray([8, 9, 10, 11], jnp.int32)
    k_new = np.arange(4 * D, dtype=np.float32).reshape(4, 1, D) / 7.0 + 1.0
    kv = fill_kv_cache(_q4(L, Hkv, NB, BS, D), jnp.asarray(k_new),
                       jnp.asarray(k_new), slot, jnp.int32(0))
    tables = jnp.asarray([[1]], jnp.int32)
    k, _ = gather_layer_kv(kv, jnp.int32(0), tables, Hkv, D)
    k = np.asarray(k)[0, 0]   # [S, D]
    for t in range(4):
        want = k_new[t, 0]
        step = (want.max() - want.min()) / 15 + 1e-6
        assert np.abs(k[t] - want).max() <= step * 0.51 + 1e-5, t


def test_engine_e2e_kv_int4(tiny_model_dir):
    """Engine with quant_policy=8: packed pages allocated, generation tracks
    the fp32 engine's early trajectory."""
    import asyncio

    from lmdeploy_tpu.engine.engine import Engine
    from lmdeploy_tpu.messages import GenerationConfig, TpuEngineConfig
    from lmdeploy_tpu.ops.kv_quant import QuantKV4

    def gen(policy):
        cfg = TpuEngineConfig(dtype='float32', block_size=16, num_gpu_blocks=64,
                              max_batch_size=4, session_len=128,
                              max_prefill_token_num=64, quant_policy=policy)
        eng = Engine.from_pretrained(tiny_model_dir, cfg)
        try:
            if policy == 8:
                kc = eng.model_agent.cache_engine.kv_cache
                assert isinstance(kc, QuantKV4)
                assert kc.data.dtype == jnp.uint8
                assert kc.data.shape[3] == 8     # block_size // 2

            async def run():
                inst = eng.create_instance()
                out = await inst.async_infer(
                    1, [5, 17, 42, 99, 7, 23, 8],
                    GenerationConfig(max_new_tokens=8, ignore_eos=True))
                await inst.async_end(1)
                return list(out.token_ids)

            loop = asyncio.new_event_loop()
            try:
                return loop.run_until_complete(run())
            finally:
                loop.close()
        finally:
            eng.close()

    full = gen(0)
    quant = gen(8)
    assert len(quant) == 8
    assert quant[:1] == full[:1]


def test_logical_shape_drives_slot_mapping():
    """Regression (round 4, found by eval/ppl_gate.py: kv4 ppl 20 -> 924):
    models read the page token capacity from ``kv_cache.shape[3]`` to build
    slot mappings.  QuantKV4 packs two tokens per byte row, so its ``.shape``
    must report the LOGICAL block size, not ``data.shape[3] == BS/2`` —
    otherwise every fill lands at half-stride and the cache is garbage."""
    import jax
    from lmdeploy_tpu.ops.attention import (compute_slot_mapping,
                                            fill_kv_cache, gather_layer_kv)
    from lmdeploy_tpu.ops.kv_quant import QuantKV4, quantize_rows_int4

    L, NB, BS, Hkv, D = 2, 8, 32, 2, 64
    cache = QuantKV4(jnp.zeros((L, NB, 2, BS // 2, Hkv * D), jnp.uint8),
                     jnp.zeros((L, NB, 2, Hkv, BS), jnp.float32),
                     jnp.zeros((L, NB, 2, Hkv, BS), jnp.float32))
    assert cache.shape == (L, NB, 2, BS, Hkv * D)

    # the model-level path: slot mapping computed FROM the wrapper's shape
    rng = np.random.RandomState(0)
    n, T = 45, 64
    tables = jnp.asarray([[1, 2]], jnp.int32)
    slots = compute_slot_mapping(tables, jnp.asarray([0], jnp.int32),
                                 jnp.asarray([n], jnp.int32), T,
                                 cache.shape[3])
    k = jnp.asarray(rng.randn(T, Hkv, D), jnp.float32)
    v = jnp.asarray(rng.randn(T, Hkv, D), jnp.float32)
    cache = fill_kv_cache(cache, k, v, slots, jnp.int32(1))
    kg, vg = gather_layer_kv(cache, jnp.int32(1), tables, Hkv, D)
    kq, sc, mn = quantize_rows_int4(k)
    want = np.asarray(kq, np.float32) * np.asarray(sc)[..., None] \
        + np.asarray(mn)[..., None]
    got = np.moveaxis(np.asarray(kg)[:, 0, :n], 0, 1)
    np.testing.assert_allclose(got, want[:n], rtol=1e-5, atol=1e-5)
