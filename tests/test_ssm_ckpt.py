"""SSM state checkpoints: prefix caching + host swap for hybrid linear-attention
models (qwen3-next gated DeltaNet).

Reference analog: ``lmdeploy/pytorch/paging/block_trie/checkpoint_lifecycle.py`` —
recurrent state snapshots keyed to block boundaries let a prefix-cache hit resume
a hybrid model token-exact instead of with a zero state.
"""
import asyncio

import numpy as np
import pytest

from test_qwen3_next import qwen3_next_dir  # noqa: F401  (module fixture)


def _engine(model_dir, **over):
    from lmdeploy_tpu.engine.engine import Engine
    from lmdeploy_tpu.messages import TpuEngineConfig
    kw = dict(dtype='float32', block_size=16, num_gpu_blocks=48,
              max_batch_size=4, session_len=256, max_prefill_token_num=64)
    kw.update(over)
    return Engine.from_pretrained(model_dir, TpuEngineConfig(**kw))


def _gen(eng, sid, prompt, n=8, end=True):
    from lmdeploy_tpu.messages import GenerationConfig

    async def run():
        inst = eng.create_instance()
        out = await inst.async_infer(sid, prompt,
                                     GenerationConfig(max_new_tokens=n,
                                                      ignore_eos=True))
        if end:
            await inst.async_end(sid)
        return list(out.token_ids)

    loop = asyncio.new_event_loop()
    try:
        return loop.run_until_complete(run())
    finally:
        loop.close()


def test_prefix_hit_restores_state(qwen3_next_dir):  # noqa: F811
    rng = np.random.RandomState(5)
    prompt = rng.randint(3, 120, size=50).tolist()   # 3 full blocks + 2 tokens

    plain = _engine(qwen3_next_dir, enable_prefix_caching=False)
    try:
        expect = _gen(plain, 1, prompt)
    finally:
        plain.close()

    eng = _engine(qwen3_next_dir, enable_prefix_caching=True)
    try:
        assert eng._ssm_ckpt is not None
        first = _gen(eng, 1, prompt)
        assert first == expect, (first, expect)
        # the aligned chunking published the deepest boundary (48 tokens)
        assert eng._ssm_ckpt.puts >= 1

        # identical prompt: must hit the checkpoint AND match token-exact —
        # a zero-state resume would diverge immediately
        second = _gen(eng, 2, prompt)
        assert second == expect, (second, expect)
        assert eng._ssm_ckpt.hits >= 1

        # shared 32-token prefix, divergent tail: no checkpoint exists at the
        # 32-token boundary (snapshots land at chunk ends only, matching the
        # reference's block-aligned prefill-end granularity), so the match is
        # clamped to zero — correctness must hold regardless
        prompt3 = prompt[:32] + rng.randint(3, 120, size=20).tolist()
        plain2 = _engine(qwen3_next_dir, enable_prefix_caching=False)
        try:
            expect3 = _gen(plain2, 1, prompt3)
        finally:
            plain2.close()
        third = _gen(eng, 3, prompt3)
        assert third == expect3, (third, expect3)

        # prompt3's own prefill published its 48-token boundary: an identical
        # prompt3 now hits that deeper checkpoint
        hits0 = eng._ssm_ckpt.hits
        fourth = _gen(eng, 4, prompt3)
        assert fourth == expect3, (fourth, expect3)
        assert eng._ssm_ckpt.hits > hits0
    finally:
        eng.close()


def test_prefix_reuse_skips_recompute(qwen3_next_dir):  # noqa: F811
    """The second request's first chunk must start past checkpointed blocks."""
    from lmdeploy_tpu.paging.seq import SamplingParams

    eng = _engine(qwen3_next_dir, enable_prefix_caching=True)
    try:
        prompt = list(range(3, 53))             # 50 tokens, blocks of 16
        _gen(eng, 1, prompt)
        eng.add_session(2)
        seq = eng.scheduler.seq_manager.get_session(2).add_sequence(
            prompt, SamplingParams(max_new_tokens=4, ignore_eos=True))
        eng.scheduler.waiting.append(seq)
        out = eng.scheduler.schedule()
        assert out.is_prefill and out.prefill_chunks
        chunk = out.prefill_chunks[0]
        assert chunk.start == 48                # deepest checkpointed boundary
        assert seq._ssm_restore is not None     # snapshot attached, pending
        #                                         consumption in _run
    finally:
        eng.close()


def test_pd_migration_linear_state(qwen3_next_dir):  # noqa: F811
    """PD disaggregation of a hybrid model: the recurrent/conv state rides the
    migration payload so the decode engine resumes token-exact."""
    from lmdeploy_tpu import disagg
    from lmdeploy_tpu.messages import ResponseType
    from lmdeploy_tpu.paging.seq import SamplingParams

    prompt = [3, 17, 42, 99, 7, 23, 55, 12, 81, 30, 5, 66, 9, 101, 44, 2, 38]

    hybrid = _engine(qwen3_next_dir, role='hybrid')
    try:
        full = _gen(hybrid, 1, prompt, n=9)
    finally:
        hybrid.close()

    pre = _engine(qwen3_next_dir, role='prefill')
    try:
        first = _gen(pre, 7, prompt, n=1, end=False)
        assert first == full[:1]
        payload = disagg.export_session_kv(pre, 7)
        assert any(k.startswith('state_') for k in payload)
        wire = disagg.serialize_payload(payload)
        disagg.release_exported(pre, 7)
    finally:
        pre.close()

    dec = _engine(qwen3_next_dir, role='decode')
    try:
        payload2 = disagg.deserialize_payload(wire)
        sp = SamplingParams(max_new_tokens=8, ignore_eos=True)

        async def run():
            disagg.import_session_kv(dec, 7, payload2, sp)
            queue = dec.continue_session(7)
            out = None
            while True:
                out = await queue.get()
                if out.status != ResponseType.SUCCESS:
                    break
            return list(out.token_ids)

        loop = asyncio.new_event_loop()
        try:
            cont = loop.run_until_complete(run())
        finally:
            loop.close()
        assert cont == full[1:], (cont, full)
    finally:
        dec.close()


def test_swap_preserves_linear_state(qwen3_next_dir):  # noqa: F811
    """Host-RAM swap preemption: the victim's recurrent state survives in its
    retained batch slot, so resumed decoding is bit-identical to an
    uncontended run."""
    from lmdeploy_tpu.messages import GenerationConfig

    rng = np.random.RandomState(9)
    p1 = rng.randint(3, 120, size=40).tolist()
    p2 = rng.randint(3, 120, size=40).tolist()

    roomy = _engine(qwen3_next_dir, enable_prefix_caching=False)
    try:
        want1 = _gen(roomy, 1, p1, n=12)
        want2 = _gen(roomy, 2, p2, n=12)
    finally:
        roomy.close()

    # tight block budget + host pool: concurrent sequences force swap
    # preemption (no trie => swap eviction path)
    eng = _engine(qwen3_next_dir, enable_prefix_caching=False,
                  num_gpu_blocks=10, num_cpu_blocks=16)
    try:
        async def burst():
            inst1, inst2 = eng.create_instance(), eng.create_instance()
            gc = GenerationConfig(max_new_tokens=12, ignore_eos=True)
            r1, r2 = await asyncio.gather(inst1.async_infer(1, p1, gc),
                                          inst2.async_infer(2, p2, gc))
            await inst1.async_end(1)
            await inst2.async_end(2)
            return list(r1.token_ids), list(r2.token_ids)

        loop = asyncio.new_event_loop()
        try:
            got1, got2 = loop.run_until_complete(burst())
        finally:
            loop.close()
        assert got1 == want1, (got1, want1)
        assert got2 == want2, (got2, want2)
    finally:
        eng.close()
