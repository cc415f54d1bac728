"""Host-RAM KV block swapping (swap-type preemption; reference: cpu blocks +
blocks_to_swap_in/out)."""
import asyncio

import numpy as np
import pytest


def _gen_many(eng, prompts, n):
    from lmdeploy_tpu.messages import GenerationConfig

    async def run():
        inst = eng.create_instance()

        async def one(sid, p):
            out = await inst.async_infer(sid, p, GenerationConfig(
                max_new_tokens=n, ignore_eos=True))
            await inst.async_end(sid)
            return list(out.token_ids)

        return await asyncio.gather(*[one(100 + i, p)
                                      for i, p in enumerate(prompts)])

    loop = asyncio.new_event_loop()
    try:
        return loop.run_until_complete(run())
    finally:
        loop.close()


def _engine(model_dir, gpu_blocks, cpu_blocks):
    from lmdeploy_tpu.engine.engine import Engine
    from lmdeploy_tpu.messages import TpuEngineConfig
    cfg = TpuEngineConfig(dtype='float32', block_size=16,
                          num_gpu_blocks=gpu_blocks, num_cpu_blocks=cpu_blocks,
                          max_batch_size=4, session_len=256,
                          max_prefill_token_num=64)
    return Engine.from_pretrained(model_dir, cfg)


def test_swap_preemption_preserves_outputs(tiny_model_dir):
    """Outputs under swap-forcing block pressure must equal the unconstrained
    engine's outputs (KV restored bit-for-bit from host RAM, no recompute)."""
    rng = np.random.RandomState(4)
    prompts = [rng.randint(3, 250, size=40).tolist() for _ in range(3)]

    roomy = _engine(tiny_model_dir, 64, 0)
    try:
        expect = _gen_many(roomy, prompts, 24)
    finally:
        roomy.close()

    # 7 device blocks: two co-resident seqs' decode-run capacity extensions
    # (40-token prompts growing past 64 tokens) cannot both fit, so one is
    # swap-preempted.  24 new tokens = two decode runs per seq, so sequences
    # genuinely co-reside under the overlap scheduler (a 10-token generation
    # would finish inside one k=16 run and never contend).
    tight = _engine(tiny_model_dir, 7, 32)
    try:
        got = _gen_many(tight, prompts, 24)
        n_preempt = tight.scheduler.num_preemptions
        ce = tight.model_agent.cache_engine
        swapped = getattr(ce, 'host_kv', None) is not None
    finally:
        tight.close()

    assert n_preempt > 0, 'test must actually force preemption'
    assert swapped, 'preemption must take the swap path (host pool allocated)'
    assert got == expect


def test_swap_pool_released(tiny_model_dir):
    """Host slots must return to the pool when sequences finish."""
    rng = np.random.RandomState(6)
    prompts = [rng.randint(3, 250, size=40).tolist() for _ in range(3)]
    eng = _engine(tiny_model_dir, 9, 32)
    try:
        _gen_many(eng, prompts, 8)
        assert len(eng.scheduler.host_pool) == 32
    finally:
        eng.close()


def test_recompute_fallback_when_no_cpu_blocks(tiny_model_dir):
    """cpu blocks exhausted/disabled -> recompute eviction still works."""
    rng = np.random.RandomState(7)
    prompts = [rng.randint(3, 250, size=40).tolist() for _ in range(3)]
    roomy = _engine(tiny_model_dir, 64, 0)
    try:
        expect = _gen_many(roomy, prompts, 24)
    finally:
        roomy.close()
    # 7 blocks + 24 new tokens: co-resident decode runs contend (see
    # test_swap_preemption_preserves_outputs)
    tight = _engine(tiny_model_dir, 7, 0)
    try:
        got = _gen_many(tight, prompts, 24)
        assert tight.scheduler.num_preemptions > 0
    finally:
        tight.close()
    assert got == expect


def test_preemption_pressure_matrix(tiny_model_dir, monkeypatch):
    """Regression for three preemption bugs found by surface driving:
    stale device block tables after resume (length-only sync check), the OOM
    guard firing before finished seqs' blocks were released, and FCFS
    head-of-line livelock while mid-chunked-prefill WAITING seqs held blocks.

    Pinned to the legacy prefill-priority scheduler (LMDEPLOY_TPU_OVERLAP=0):
    the overlap scheduler's no-preempt admission serializes these workloads
    instead of preempting, so the legacy preemption paths — still the ones
    used by guided/spec/dllm strategies — need this explicit exercise."""
    monkeypatch.setenv('LMDEPLOY_TPU_OVERLAP', '0')
    rng = np.random.RandomState(4)
    prompts = [rng.randint(3, 250, size=60).tolist() for _ in range(3)]

    roomy = _engine(tiny_model_dir, 64, 0)
    try:
        expect = _gen_many(roomy, prompts, 24)
    finally:
        roomy.close()

    # 24 new tokens = multiple decode runs per seq, so sequences co-reside
    # and capacity extensions contend under the overlap scheduler
    for gpu, cpu in [(9, 0), (9, 32), (11, 0), (8, 0)]:
        eng = _engine(tiny_model_dir, gpu, cpu)
        try:
            got = _gen_many(eng, prompts, 24)
            assert eng.scheduler.num_preemptions > 0, (gpu, cpu)
        finally:
            eng.close()
        assert got == expect, (gpu, cpu)
