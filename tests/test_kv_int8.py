"""Per-token int8 KV cache (quant_policy=4) tests — unified layout."""
import numpy as np
import pytest

import jax.numpy as jnp


def test_quantize_roundtrip():
    from lmdeploy_tpu.ops.kv_quant import dequantize, quantize_rows

    rng = np.random.RandomState(0)
    x = rng.randn(7, 2, 64).astype(np.float32) * 3.0
    q, s = quantize_rows(jnp.asarray(x))
    back = np.asarray(dequantize(q, s))
    # absmax/127 per row: error bounded by scale/2 per element
    err = np.abs(back - x)
    bound = np.asarray(s)[..., None] * 0.5 + 1e-6
    assert (err <= bound).all()
    assert np.asarray(q).dtype == np.int8


def test_fill_and_attention_quant_matches_manual_dequant():
    """fill_kv_cache + paged_attention on a QuantKV cache must equal the plain
    reference attention run on the explicitly dequantized gathered pages."""
    from lmdeploy_tpu.ops.attention import (attention_dense_gathered,
                                            compute_slot_mapping,
                                            fill_kv_cache, gather_layer_kv,
                                            kv_row_width, paged_attention)
    from lmdeploy_tpu.ops.kv_quant import QuantKV

    rng = np.random.RandomState(1)
    L, Hkv, NB, BS, D = 2, 2, 8, 16, 64
    B, T, Hq = 2, 8, 4
    _, rowp = kv_row_width(Hkv, D)
    kv = QuantKV(jnp.zeros((L, NB, 2, BS, rowp), jnp.int8),
                 jnp.zeros((L, NB, 2, BS, Hkv), jnp.float32))
    tables = np.asarray([[1, 2, 0, 0], [3, 4, 0, 0]], np.int32)
    history = np.zeros(B, np.int32)
    q_lens = np.full(B, T, np.int32)
    slot = compute_slot_mapping(jnp.asarray(tables), jnp.asarray(history),
                                jnp.asarray(q_lens), T, BS)
    k_new = rng.randn(B * T, Hkv, D).astype(np.float32)
    v_new = rng.randn(B * T, Hkv, D).astype(np.float32)
    layer = jnp.int32(1)
    kv = fill_kv_cache(kv, jnp.asarray(k_new), jnp.asarray(v_new), slot, layer)

    q = rng.randn(B, T, Hq, D).astype(np.float32)
    got = paged_attention(jnp.asarray(q), kv, jnp.asarray(tables),
                          jnp.asarray(history), jnp.asarray(q_lens),
                          0.125, layer, Hkv)

    # manual: gather + dequantize, then dense attention
    k_deq, v_deq = gather_layer_kv(kv, layer, jnp.asarray(tables), Hkv, D)
    want = attention_dense_gathered(jnp.asarray(q), k_deq, v_deq,
                                    jnp.asarray(history), 0.125)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    # and the quantized attention tracks an UNQUANTIZED cache closely
    kf = jnp.zeros((L, NB, 2, BS, rowp), jnp.float32)
    kf = fill_kv_cache(kf, jnp.asarray(k_new), jnp.asarray(v_new), slot, layer)
    kd, vd = gather_layer_kv(kf, layer, jnp.asarray(tables), Hkv, D)
    plain = attention_dense_gathered(jnp.asarray(q), kd, vd,
                                     jnp.asarray(history), 0.125)
    g, p = np.asarray(got).ravel(), np.asarray(plain).ravel()
    cos = float(g @ p / (np.linalg.norm(g) * np.linalg.norm(p) + 1e-9))
    assert cos > 0.999


def test_engine_e2e_kv_int8(tiny_model_dir):
    """Engine with quant_policy=4: int8 pages + scales, sane generation that
    tracks the fp32 engine."""
    import asyncio

    from lmdeploy_tpu.engine.engine import Engine
    from lmdeploy_tpu.messages import GenerationConfig, TpuEngineConfig
    from lmdeploy_tpu.ops.kv_quant import QuantKV

    def gen(policy):
        cfg = TpuEngineConfig(dtype='float32', block_size=16, num_gpu_blocks=64,
                              max_batch_size=4, session_len=128,
                              max_prefill_token_num=64, quant_policy=policy)
        eng = Engine.from_pretrained(tiny_model_dir, cfg)
        try:
            if policy == 4:
                assert isinstance(eng.model_agent.cache_engine.kv_cache, QuantKV)
                assert eng.model_agent.cache_engine.kv_cache.dtype == jnp.int8

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
    quant = gen(4)
    assert len(quant) == 8
    # int8 per-token KV keeps early greedy tokens on the fp32 trajectory
    assert quant[:2] == full[:2]
