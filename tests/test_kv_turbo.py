"""TurboQuant k4v2 KV cache (quant_policy=42) tests.

Reference analog: kernels/cuda/turbo_quant.py (rotation + Lloyd-Max
codebooks), fill_kv_cache.py:325-515 (QJL4 / int2 fill), pagedattention.py
turbo dequant, backends/cuda/attention/default.py:354-383 (q rotation).
"""
import numpy as np
import pytest

import jax.numpy as jnp


def test_hadamard_orthogonal():
    from lmdeploy_tpu.ops.kv_quant import hadamard
    for d in (16, 64, 128):
        Q = hadamard(d)
        np.testing.assert_allclose(Q @ Q.T, np.eye(d), atol=1e-5)


def test_turbo_k_roundtrip_snr():
    """K path: rotate -> 3-bit Lloyd-Max + QJL sign -> dequant recovers the
    rotated row well, and scores q.k survive (the whole point of the
    rotation: spread outliers so per-coordinate codes work)."""
    from lmdeploy_tpu.ops.kv_quant import (dequantize_turbo_k, hadamard_rotate,
                                           quantize_rows_turbo_k)
    rng = np.random.RandomState(0)
    D = 64
    k = rng.randn(200, 2, D).astype(np.float32)
    k[:, :, 5] *= 8.0       # an outlier channel — rope'd K's usual failure
    k_rot = hadamard_rotate(jnp.asarray(k))
    nib, mse, qjl = quantize_rows_turbo_k(k_rot)
    assert int(jnp.max(nib)) <= 15
    k_hat = dequantize_turbo_k(nib, mse, qjl)
    rel = float(jnp.linalg.norm(k_hat - k_rot) / jnp.linalg.norm(k_rot))
    assert rel < 0.25, rel
    # scores against a realistic q, rotated-domain dot == original-domain dot
    q = jnp.asarray(rng.randn(8, 2, D).astype(np.float32))
    s_true = jnp.einsum('qhd,khd->hqk', q, jnp.asarray(k))
    s_rot = jnp.einsum('qhd,khd->hqk', hadamard_rotate(q), k_rot)
    np.testing.assert_allclose(np.asarray(s_true), np.asarray(s_rot),
                               rtol=1e-3, atol=1e-3)
    s_hat = jnp.einsum('qhd,khd->hqk', hadamard_rotate(q), k_hat)
    err = float(jnp.abs(s_hat - s_true).mean() / jnp.abs(s_true).std())
    assert err < 0.2, err


def test_turbo_v_roundtrip_snr():
    from lmdeploy_tpu.ops.kv_quant import (dequantize_turbo_v, hadamard_rotate,
                                           quantize_rows_turbo_v)
    rng = np.random.RandomState(1)
    v = jnp.asarray(rng.randn(200, 2, 64).astype(np.float32))
    v_rot = hadamard_rotate(v)
    code, norm = quantize_rows_turbo_v(v_rot)
    assert int(jnp.max(code)) <= 3
    v_hat = dequantize_turbo_v(code, norm)
    rel = float(jnp.linalg.norm(v_hat - v_rot) / jnp.linalg.norm(v_rot))
    assert rel < 0.4, rel      # 2-bit: coarse but norm-preserving


def test_fill_gather_matches_direct_roundtrip():
    """The cache path (fill + gather, slot mapping computed from the wrapper
    shape as models do) must reproduce the direct quantize->dequant exactly."""
    from lmdeploy_tpu.ops.attention import (compute_slot_mapping,
                                            fill_kv_cache, gather_layer_kv)
    from lmdeploy_tpu.ops.kv_quant import (QuantKVTurbo, dequantize_turbo_k,
                                           dequantize_turbo_v, hadamard_rotate,
                                           quantize_rows_turbo_k,
                                           quantize_rows_turbo_v)
    L, NB, BS, Hkv, D = 2, 8, 32, 2, 64
    rowt = Hkv * D // 2
    cache = QuantKVTurbo(jnp.zeros((L, NB, 2, BS, rowt), jnp.uint8),
                         jnp.zeros((L, NB, 2, 2, Hkv, BS), jnp.float32))
    assert cache.shape[3] == BS
    rng = np.random.RandomState(2)
    n, T = 45, 64
    tables = jnp.asarray([[1, 2]], jnp.int32)
    slots = compute_slot_mapping(tables, jnp.asarray([0], jnp.int32),
                                 jnp.asarray([n], jnp.int32), T,
                                 cache.shape[3])
    k = jnp.asarray(rng.randn(T, Hkv, D), jnp.float32)
    v = jnp.asarray(rng.randn(T, Hkv, D), jnp.float32)
    cache = fill_kv_cache(cache, k, v, slots, jnp.int32(1))
    kg, vg = gather_layer_kv(cache, jnp.int32(1), tables, Hkv, D)

    nib, mse, qjl = quantize_rows_turbo_k(hadamard_rotate(k))
    want_k = np.asarray(dequantize_turbo_k(nib, mse, qjl))[:n]
    got_k = np.moveaxis(np.asarray(kg)[:, 0, :n], 0, 1)
    np.testing.assert_allclose(got_k, want_k, rtol=1e-5, atol=1e-5)

    code, norm = quantize_rows_turbo_v(hadamard_rotate(v))
    want_v = np.asarray(dequantize_turbo_v(code, norm))[:n]
    got_v = np.moveaxis(np.asarray(vg)[:, 0, :n], 0, 1)
    np.testing.assert_allclose(got_v, want_v, rtol=1e-5, atol=1e-5)


def test_engine_e2e_turbo(tiny_model_dir):
    """Engine with quant_policy=42: packed pages allocated, early greedy
    trajectory tracks the fp32 engine."""
    import asyncio

    from lmdeploy_tpu.engine.engine import Engine
    from lmdeploy_tpu.messages import GenerationConfig, TpuEngineConfig
    from lmdeploy_tpu.ops.kv_quant import QuantKVTurbo

    def gen(policy):
        cfg = TpuEngineConfig(dtype='float32', block_size=16, num_gpu_blocks=64,
                              max_batch_size=4, session_len=128,
                              max_prefill_token_num=64, quant_policy=policy)
        eng = Engine.from_pretrained(tiny_model_dir, cfg)
        try:
            if policy == 42:
                kc = eng.model_agent.cache_engine.kv_cache
                assert isinstance(kc, QuantKVTurbo)
                assert kc.data.dtype == jnp.uint8

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
    quant = gen(42)
    assert len(quant) == 8
    assert quant[:1] == full[:1]
