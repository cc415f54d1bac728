"""Per-token int8 KV cache (quant_policy=4) tests."""
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
    reference attention run on the explicitly dequantized pages."""
    from lmdeploy_tpu.ops.attention import (compute_slot_mapping, fill_kv_cache,
                                            paged_attention,
                                            paged_attention_reference)
    from lmdeploy_tpu.ops.kv_quant import QuantKV, dequantize

    rng = np.random.RandomState(1)
    L, Hkv, NB, BS, D = 2, 2, 8, 16, 64
    B, T, Hq = 2, 8, 4
    kq = QuantKV(jnp.zeros((L, Hkv, NB, BS, D), jnp.int8),
                 jnp.zeros((L, Hkv, NB, BS), jnp.float32))
    vq = QuantKV(jnp.zeros((L, Hkv, NB, BS, D), jnp.int8),
                 jnp.zeros((L, Hkv, NB, BS), jnp.float32))
    tables = np.asarray([[1, 2, 0, 0], [3, 4, 0, 0]], np.int32)
    history = np.zeros(B, np.int32)
    q_lens = np.full(B, T, np.int32)
    slot = compute_slot_mapping(jnp.asarray(tables), jnp.asarray(history),
                                jnp.asarray(q_lens), T, BS)
    k_new = rng.randn(B * T, Hkv, D).astype(np.float32)
    v_new = rng.randn(B * T, Hkv, D).astype(np.float32)
    layer = jnp.int32(1)
    kq, vq = fill_kv_cache(kq, vq, jnp.asarray(k_new), jnp.asarray(v_new),
                           slot, layer)

    q = rng.randn(B, T, Hq, D).astype(np.float32)
    got = paged_attention(jnp.asarray(q), kq, vq, jnp.asarray(tables),
                          jnp.asarray(history), jnp.asarray(q_lens),
                          0.125, layer)

    k_deq = dequantize(kq.data[1], kq.scale[1])
    v_deq = dequantize(vq.data[1], vq.scale[1])
    want = paged_attention_reference(jnp.asarray(q), k_deq, v_deq,
                                     jnp.asarray(tables), jnp.asarray(history),
                                     jnp.asarray(q_lens), 0.125)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    # and the quantized attention tracks an UNQUANTIZED cache closely
    kf = jnp.zeros((L, Hkv, NB, BS, D), jnp.float32)
    vf = jnp.zeros_like(kf)
    kf, vf = fill_kv_cache(kf, vf, jnp.asarray(k_new), jnp.asarray(v_new),
                           slot, layer)
    plain = paged_attention_reference(jnp.asarray(q), kf[1], vf[1],
                                      jnp.asarray(tables), jnp.asarray(history),
                                      jnp.asarray(q_lens), 0.125)
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
                assert isinstance(eng.model_agent.cache_engine.k_cache, QuantKV)
                assert eng.model_agent.cache_engine.k_cache.dtype == jnp.int8

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
