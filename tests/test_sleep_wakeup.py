"""Engine sleep/wakeup + online weight update (RL colocation APIs)."""
import asyncio

import numpy as np
import pytest


def _gen(eng, session_id, prompt, n=4):
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


@pytest.fixture()
def eng(tiny_model_dir):
    from lmdeploy_tpu.engine.engine import Engine
    from lmdeploy_tpu.messages import TpuEngineConfig
    cfg = TpuEngineConfig(dtype='float32', block_size=16, num_gpu_blocks=32,
                          max_batch_size=4, session_len=128,
                          max_prefill_token_num=64)
    e = Engine.from_pretrained(tiny_model_dir, cfg)
    yield e
    e.close()


def test_sleep_wakeup_roundtrip(eng):
    prompt = [1, 5, 9, 13, 20]
    before = _gen(eng, 1, prompt)
    eng.sleep(level=1)
    assert eng.model_agent.cache_engine.kv_cache is None
    eng.wakeup()
    after = _gen(eng, 2, prompt)
    assert before == after           # greedy output identical post-wakeup


def test_sleep_level2_offloads_weights(eng):
    prompt = [1, 5, 9]
    before = _gen(eng, 1, prompt)
    eng.sleep(level=2)
    assert eng.model_agent.host_params() is None
    eng.wakeup()
    after = _gen(eng, 2, prompt)
    assert before == after


def test_sleep_refuses_while_busy(eng):
    from lmdeploy_tpu.paging.seq import SamplingParams
    eng.add_session(9)
    eng.scheduler.seq_manager.get_session(9).add_sequence(
        [1, 2, 3], SamplingParams())
    with pytest.raises(AssertionError):
        eng.sleep()
    eng.end_session(9)


def test_update_params_changes_output(eng):
    prompt = [1, 5, 9, 13]
    before = _gen(eng, 1, prompt)
    H = eng.model_config.hidden_size
    V = eng.model_config.vocab_size
    rng = np.random.RandomState(99)
    applied = eng.update_params([
        ('lm_head.weight', rng.randn(V, H).astype(np.float32) * 0.5)])
    assert applied == 1
    after = _gen(eng, 2, prompt)
    assert before != after           # new head changes greedy tokens
