"""Prefix caching end-to-end through the engine: correctness after cache hits."""
import asyncio

import numpy as np
import pytest


def _engine(model_dir, prefix_caching=True):
    from lmdeploy_tpu.engine.engine import Engine
    from lmdeploy_tpu.messages import TpuEngineConfig
    cfg = TpuEngineConfig(dtype='float32', block_size=16, num_gpu_blocks=64,
                          max_batch_size=4, session_len=256,
                          max_prefill_token_num=128,
                          enable_prefix_caching=prefix_caching)
    return Engine.from_pretrained(model_dir, cfg)


def _gen(eng, sid, prompt, n=6):
    from lmdeploy_tpu.messages import GenerationConfig

    async def run():
        inst = eng.create_instance()
        out = await inst.async_infer(sid, prompt,
                                     GenerationConfig(max_new_tokens=n,
                                                      ignore_eos=True))
        await inst.async_end(sid)
        return out.token_ids

    loop = asyncio.new_event_loop()
    try:
        return loop.run_until_complete(run())
    finally:
        loop.close()


def test_prefix_hit_preserves_output(tiny_model_dir):
    rng = np.random.RandomState(11)
    prompt = rng.randint(3, 250, size=50).tolist()   # 3 full blocks + 2 tokens

    plain = _engine(tiny_model_dir, prefix_caching=False)
    try:
        expect = _gen(plain, 1, prompt)
    finally:
        plain.close()

    eng = _engine(tiny_model_dir, prefix_caching=True)
    try:
        first = _gen(eng, 1, prompt)
        assert first == expect
        cached = eng.scheduler.block_trie.num_cached_blocks
        assert cached >= 3                      # prompt blocks published

        # identical prompt again: must reuse the cached prefix AND match exactly
        second = _gen(eng, 2, prompt)
        assert second == expect

        # shared 32-token prefix, divergent tail: correctness must hold
        prompt3 = prompt[:32] + rng.randint(3, 250, size=20).tolist()
        plain2 = _engine(tiny_model_dir, prefix_caching=False)
        try:
            expect3 = _gen(plain2, 1, prompt3)
        finally:
            plain2.close()
        third = _gen(eng, 3, prompt3)
        assert third == expect3
    finally:
        eng.close()


def test_prefix_reuse_skips_recompute(tiny_model_dir):
    """The second request's prefill chunk must start past the cached blocks."""
    from lmdeploy_tpu.paging.seq import SamplingParams

    eng = _engine(tiny_model_dir, prefix_caching=True)
    try:
        prompt = list(range(3, 53))             # 50 tokens, blocks of 16
        _gen(eng, 1, prompt)
        eng.add_session(2)
        seq = eng.scheduler.seq_manager.get_session(2).add_sequence(
            prompt, SamplingParams(max_new_tokens=4, ignore_eos=True))
        out = eng.scheduler.schedule()
        chunk = out.prefill_chunks[0]
        assert chunk.start == 48                # 3 cached blocks adopted
        assert chunk.length == 2
        eng.scheduler.on_prefill_done(chunk, 7)
        eng.end_session(2)
    finally:
        eng.close()
