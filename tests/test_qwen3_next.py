"""Qwen3-Next (hybrid gated-DeltaNet + full attention): engine vs transformers.

The transformers implementation is the golden reference: a tiny random
Qwen3NextForCausalLM is saved as a checkpoint, loaded by our engine, and
greedy generations must match token-for-token — covering the linear-attention
recurrence, conv state, gated full attention with partial rope, and the
shared-expert MoE, end to end through the paged engine.
"""
import asyncio
import json
import os

import numpy as np
import pytest


@pytest.fixture(scope='module')
def qwen3_next_dir(tmp_path_factory):
    import torch
    from transformers.models.qwen3_next import (Qwen3NextConfig,
                                                Qwen3NextForCausalLM)
    from conftest import make_tiny_tokenizer

    path = str(tmp_path_factory.mktemp('tiny_qwen3_next'))
    cfg = Qwen3NextConfig(
        hidden_size=64, intermediate_size=96,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32,
        linear_num_key_heads=2, linear_num_value_heads=4,
        linear_key_head_dim=16, linear_value_head_dim=16,
        linear_conv_kernel_dim=4, full_attention_interval=4,
        num_experts=4, num_experts_per_tok=2, moe_intermediate_size=32,
        shared_expert_intermediate_size=48, decoder_sparse_step=1,
        norm_topk_prob=True, mlp_only_layers=[],
        vocab_size=128, partial_rotary_factor=0.25,
        rope_theta=10000.0, max_position_embeddings=512,
        rms_norm_eps=1e-6, tie_word_embeddings=False,
        bos_token_id=1, eos_token_id=2)
    torch.manual_seed(3)
    model = Qwen3NextForCausalLM(cfg)
    model = model.float().eval()
    model.save_pretrained(path, safe_serialization=True)
    make_tiny_tokenizer(path, vocab_size=128)
    return path


def _hf_greedy(model_dir, prompt, n):
    import torch
    from transformers import AutoModelForCausalLM

    model = AutoModelForCausalLM.from_pretrained(
        model_dir, torch_dtype=torch.float32).eval()
    ids = torch.tensor([prompt])
    with torch.no_grad():
        out = model.generate(ids, max_new_tokens=n, do_sample=False,
                             use_cache=True)
    return out[0, len(prompt):].tolist()


def _engine(model_dir, **over):
    from lmdeploy_tpu.engine.engine import Engine
    from lmdeploy_tpu.messages import TpuEngineConfig
    kw = dict(dtype='float32', block_size=16, num_gpu_blocks=48,
              max_batch_size=4, session_len=256, max_prefill_token_num=64)
    kw.update(over)
    return Engine.from_pretrained(model_dir, TpuEngineConfig(**kw))


def _gen(eng, sid, prompt, n):
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


def test_greedy_matches_transformers(qwen3_next_dir):
    prompt = [3, 17, 42, 99, 7, 23, 55, 12, 81, 30, 5]
    want = _hf_greedy(qwen3_next_dir, prompt, 10)
    eng = _engine(qwen3_next_dir)
    try:
        got = _gen(eng, 1, prompt, 10)
        # hybrid: only 1 of 4 layers holds paged KV
        assert eng.model_agent.cache_engine.kv_cache['pages'].shape[0] == 1
        assert eng.model_agent.cache_engine.kv_cache['rec'].shape[0] == 3
    finally:
        eng.close()
    assert got == want, (got, want)


def test_chunked_prefill_matches_one_shot(qwen3_next_dir):
    """A long prompt forced through tiny prefill chunks must produce the same
    greedy tokens — the conv/recurrent state carries across chunks."""
    rng = np.random.RandomState(9)
    prompt = rng.randint(3, 120, size=50).tolist()

    big = _engine(qwen3_next_dir, max_prefill_token_num=128)
    try:
        want = _gen(big, 1, prompt, 8)
    finally:
        big.close()

    small = _engine(qwen3_next_dir, max_prefill_token_num=16)
    try:
        got = _gen(small, 2, prompt, 8)
    finally:
        small.close()
    assert got == want, (got, want)


def test_concurrent_sessions_isolated_state(qwen3_next_dir):
    """Interleaved sessions must not cross-pollute recurrent state."""
    rng = np.random.RandomState(11)
    prompts = [rng.randint(3, 120, size=n).tolist() for n in (8, 19, 33)]
    eng = _engine(qwen3_next_dir)
    try:
        solo = [_gen(eng, 50 + i, p, 6) for i, p in enumerate(prompts)]

        async def burst():
            insts = [eng.create_instance() for _ in prompts]
            from lmdeploy_tpu.messages import GenerationConfig

            async def one(i):
                out = await insts[i].async_infer(
                    80 + i, prompts[i],
                    GenerationConfig(max_new_tokens=6, ignore_eos=True))
                await insts[i].async_end(80 + i)
                return list(out.token_ids)

            return await asyncio.gather(*[one(i) for i in range(len(prompts))])

        loop = asyncio.new_event_loop()
        try:
            together = loop.run_until_complete(burst())
        finally:
            loop.close()
    finally:
        eng.close()
    assert together == solo, (together, solo)
