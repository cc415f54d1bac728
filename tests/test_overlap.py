"""Prefill/decode overlap: staggered arrivals dispatch prefill behind the
in-flight decode run (reference analog: two-batch DP+EP overlap,
``lmdeploy/pytorch/engine/model_agent/agent.py:349-355``).

Correctness contract: with overlap on (the default), a request arriving while
another decodes must produce the same tokens as a solo run, and the decoding
request must be unaffected.
"""
import asyncio

import numpy as np
import pytest


def _engine(model_dir, **over):
    from lmdeploy_tpu.engine.engine import Engine
    from lmdeploy_tpu.messages import TpuEngineConfig
    kw = dict(dtype='float32', block_size=16, num_gpu_blocks=64,
              max_batch_size=8, session_len=256, max_prefill_token_num=64)
    kw.update(over)
    return Engine.from_pretrained(model_dir, TpuEngineConfig(**kw))


def _solo(eng, sid, prompt, n):
    from lmdeploy_tpu.messages import GenerationConfig

    async def run():
        inst = eng.create_instance()
        out = await inst.async_infer(sid, prompt,
                                     GenerationConfig(max_new_tokens=n,
                                                      ignore_eos=True))
        await inst.async_end(sid)
        return list(out.token_ids)

    loop = asyncio.new_event_loop()
    try:
        return loop.run_until_complete(run())
    finally:
        loop.close()


def test_staggered_arrival_exact(tiny_model_dir):
    rng = np.random.RandomState(21)
    p1 = rng.randint(3, 250, size=40).tolist()
    p2 = rng.randint(3, 250, size=35).tolist()
    p3 = rng.randint(3, 250, size=20).tolist()

    eng = _engine(tiny_model_dir)
    try:
        assert eng._overlap
        want1 = _solo(eng, 101, p1, 96)
        want2 = _solo(eng, 102, p2, 16)
        want3 = _solo(eng, 103, p3, 12)

        from lmdeploy_tpu.messages import GenerationConfig

        async def staggered():
            i1, i2, i3 = (eng.create_instance() for _ in range(3))
            decoding = asyncio.Event()   # set once p1 has streamed a token

            async def streamer():
                toks = []
                async for out in i1.async_stream_infer(
                        1, p1, GenerationConfig(max_new_tokens=96,
                                                ignore_eos=True)):
                    toks = list(out.token_ids)
                    if toks:
                        decoding.set()
                await i1.async_end(1)
                return toks

            async def one(inst, sid, prompt, n):
                # arrive strictly while p1 is mid-decode so the prefill rides
                # the overlap path behind the in-flight run
                await decoding.wait()
                out = await inst.async_infer(
                    sid, prompt, GenerationConfig(max_new_tokens=n,
                                                  ignore_eos=True))
                await inst.async_end(sid)
                return list(out.token_ids)

            return await asyncio.gather(
                streamer(), one(i2, 2, p2, 16), one(i3, 3, p3, 12))

        loop = asyncio.new_event_loop()
        try:
            got1, got2, got3 = loop.run_until_complete(staggered())
        finally:
            loop.close()
        assert got1 == want1, (got1, want1)
        assert got2 == want2, (got2, want2)
        assert got3 == want3, (got3, want3)
        # the staggered arrivals must have actually ridden the overlap path
        # (prefill dispatched behind an in-flight decode run)
        assert eng._overlap_dispatches > 0
    finally:
        eng.close()


def test_overlap_scheduler_pass_never_preempts(tiny_model_dir):
    """With blocks exhausted by running sequences, the overlap pass must admit
    nothing (no preemption) — the normal scheduler path handles it later."""
    from lmdeploy_tpu.paging.seq import SamplingParams

    eng = _engine(tiny_model_dir, num_gpu_blocks=8, max_batch_size=4)
    try:
        # occupy most blocks with one long-running sequence
        prompt = list(range(3, 83))     # 5 blocks
        _solo(eng, 1, prompt, 8)

        eng.add_session(2)
        seq = eng.scheduler.seq_manager.get_session(2).add_sequence(
            list(range(3, 120)), SamplingParams(max_new_tokens=4))
        eng.scheduler.waiting.append(seq)
        before = eng.scheduler.num_preemptions
        out = eng.scheduler.schedule_overlap_prefill()
        # either admitted without preemption or skipped — never preempted
        assert eng.scheduler.num_preemptions == before
    finally:
        eng.close()
