"""Online KV-cache quantization (fp8 e4m3 policy).

Reference analog: tests/test_lmdeploy/test_quant_policy.py + kv_quant accuracy
tables (docs/en/quantization/kv_quant.md): quantized-KV generation must track the
fp16-KV generation closely.
"""
import asyncio

import numpy as np
import pytest


def _gen(eng, session_id, prompt, n=8):
    from lmdeploy_tpu.messages import GenerationConfig

    async def run():
        inst = eng.create_instance()
        out = await inst.async_infer(session_id, prompt,
                                     GenerationConfig(max_new_tokens=n,
                                                      ignore_eos=True))
        await inst.async_end(session_id)
        return out.token_ids

    loop = asyncio.new_event_loop()
    try:
        return loop.run_until_complete(run())
    finally:
        loop.close()


def _make_engine(model_dir, quant_policy):
    from lmdeploy_tpu.engine.engine import Engine
    from lmdeploy_tpu.messages import TpuEngineConfig
    cfg = TpuEngineConfig(dtype='float32', block_size=16, num_gpu_blocks=48,
                          max_batch_size=4, session_len=128,
                          max_prefill_token_num=64, quant_policy=quant_policy)
    return Engine.from_pretrained(model_dir, cfg)


def test_fp8_cache_dtype(tiny_model_dir):
    import jax.numpy as jnp
    eng = _make_engine(tiny_model_dir, 16)
    try:
        assert eng.model_agent.cache_engine.kv_cache.dtype == jnp.float8_e4m3fn
    finally:
        eng.close()


def test_fp8_kv_tracks_full_precision(tiny_model_dir):
    prompt = [1, 17, 42, 99, 7, 23, 55, 12]
    eng_fp = _make_engine(tiny_model_dir, 0)
    try:
        ref = _gen(eng_fp, 1, prompt, n=8)
    finally:
        eng_fp.close()
    eng_q = _make_engine(tiny_model_dir, 16)
    try:
        got = _gen(eng_q, 1, prompt, n=8)
    finally:
        eng_q.close()
    assert len(got) == 8
    # fp8 KV must agree with full precision on the greedy continuation prefix
    agree = sum(1 for a, b in zip(ref, got) if a == b)
    assert agree >= 4, (ref, got)


def test_fp8_block_budget_doubles(tiny_model_dir):
    """1-byte KV must double the derived block budget at equal memory."""
    from lmdeploy_tpu.config import CacheConfig, ModelConfig
    from lmdeploy_tpu.engine.cache_engine import CacheEngine
    mc = ModelConfig.from_pretrained(tiny_model_dir, dtype='float32')
    fp = CacheEngine(mc, CacheConfig(block_size=16, num_gpu_blocks=8))
    q = CacheEngine(mc, CacheConfig(block_size=16, num_gpu_blocks=8,
                                    quant_policy=16))
    assert q.block_bytes() * 4 == fp.block_bytes()   # f32 -> f8
