"""End-to-end speculative decoding.

With the draft == the target checkpoint, greedy speculation must accept every
proposal and reproduce the non-speculative output token-for-token — this
exercises the draft scan, the multi-position verification forward, the rejection
sampler, and the variable-advance state update.
"""
import asyncio

import numpy as np
import pytest


def _gen(eng, session_id, prompt, n):
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


def _engine(model_dir, spec=None):
    from lmdeploy_tpu.engine.engine import Engine
    from lmdeploy_tpu.messages import TpuEngineConfig
    cfg = TpuEngineConfig(dtype='float32', block_size=16, num_gpu_blocks=64,
                          max_batch_size=4, session_len=256,
                          max_prefill_token_num=64)
    return Engine.from_pretrained(model_dir, cfg, speculative_config=spec)


def test_spec_greedy_matches_plain(tiny_model_dir):
    from lmdeploy_tpu.messages import SpeculativeConfig

    prompt = [1, 17, 42, 99, 7, 23, 55, 12]
    plain = _engine(tiny_model_dir)
    try:
        expect = _gen(plain, 1, prompt, 12)
    finally:
        plain.close()

    spec = _engine(tiny_model_dir,
                   SpeculativeConfig(model=tiny_model_dir,
                                     num_speculative_tokens=3))
    try:
        got = _gen(spec, 1, prompt, 12)
    finally:
        spec.close()
    assert got == expect, (got, expect)


def test_spec_emits_exact_token_count(tiny_model_dir):
    from lmdeploy_tpu.messages import SpeculativeConfig
    spec = _engine(tiny_model_dir,
                   SpeculativeConfig(model=tiny_model_dir,
                                     num_speculative_tokens=4))
    try:
        out = _gen(spec, 2, [3, 9, 27], 7)    # 7 not divisible by k+1
        assert len(out) == 7
    finally:
        spec.close()


def test_spec_concurrent_batch(tiny_model_dir):
    from lmdeploy_tpu.messages import GenerationConfig, SpeculativeConfig

    rng = np.random.RandomState(5)
    prompts = [rng.randint(3, 250, size=n).tolist() for n in (6, 14, 9)]
    plain = _engine(tiny_model_dir)
    try:
        expect = [_gen(plain, 10 + i, p, 8) for i, p in enumerate(prompts)]
    finally:
        plain.close()

    spec = _engine(tiny_model_dir,
                   SpeculativeConfig(model=tiny_model_dir,
                                     num_speculative_tokens=3))
    try:
        async def run_all():
            from lmdeploy_tpu.messages import GenerationConfig

            async def one(i, prompt):
                inst = spec.create_instance()
                out = await inst.async_infer(
                    20 + i, prompt, GenerationConfig(max_new_tokens=8,
                                                     ignore_eos=True))
                await inst.async_end(20 + i)
                return out.token_ids

            return await asyncio.gather(*[one(i, p)
                                          for i, p in enumerate(prompts)])

        loop = asyncio.new_event_loop()
        try:
            got = loop.run_until_complete(run_all())
        finally:
            loop.close()
    finally:
        spec.close()
    assert list(got) == expect
