"""LoRA adapter loading + merge/unmerge semantics."""
import asyncio
import json
import os

import numpy as np
import pytest


@pytest.fixture()
def peft_dir(tmp_path):
    """Synthetic PEFT adapter for the tiny llama (q/v targets, r=4)."""
    from safetensors.numpy import save_file

    r, H, nh, nkv, hd = 4, 64, 4, 2, 16
    with open(tmp_path / 'adapter_config.json', 'w') as f:
        json.dump({'r': r, 'lora_alpha': 8, 'peft_type': 'LORA',
                   'target_modules': ['q_proj', 'v_proj']}, f)
    rng = np.random.RandomState(0)
    tensors = {}
    for layer in range(2):
        p = f'base_model.model.model.layers.{layer}.'
        tensors[p + 'self_attn.q_proj.lora_A.weight'] = \
            rng.randn(r, H).astype(np.float32) * 0.1
        tensors[p + 'self_attn.q_proj.lora_B.weight'] = \
            rng.randn(nh * hd, r).astype(np.float32) * 0.1
        tensors[p + 'self_attn.v_proj.lora_A.weight'] = \
            rng.randn(r, H).astype(np.float32) * 0.1
        tensors[p + 'self_attn.v_proj.lora_B.weight'] = \
            rng.randn(nkv * hd, r).astype(np.float32) * 0.1
    save_file(tensors, str(tmp_path / 'adapter_model.safetensors'))
    return str(tmp_path)


def test_peft_parsing(peft_dir):
    from lmdeploy_tpu.lora import load_peft_adapter
    weights, scaling = load_peft_adapter(peft_dir)
    assert scaling == 2.0                       # alpha 8 / r 4
    assert set(weights) == {'wq', 'wv'}
    assert weights['wq'][0]['A'].shape == (4, 64)
    assert weights['wq'][1]['B'].shape == (64, 4)


def _gen(eng, sid, prompt, n=5):
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


def test_lora_merge_swap_unmerge(tiny_model_dir, peft_dir):
    from lmdeploy_tpu.engine.engine import Engine
    from lmdeploy_tpu.messages import TpuEngineConfig
    eng = Engine.from_pretrained(
        tiny_model_dir,
        TpuEngineConfig(dtype='float32', block_size=16, num_gpu_blocks=32,
                        max_batch_size=4, session_len=128,
                        max_prefill_token_num=64))
    try:
        prompt = [1, 17, 42, 99, 7]
        base = _gen(eng, 1, prompt)
        base_wq = np.asarray(eng.model_agent.host_params()['layers']['wq'])

        eng.load_lora('style', peft_dir)
        eng.activate_lora('style')
        merged_wq = np.asarray(eng.model_agent.host_params()['layers']['wq'])
        assert not np.allclose(base_wq, merged_wq)
        with_lora = _gen(eng, 2, prompt)
        assert with_lora != base                 # adapter changes greedy output

        eng.deactivate_lora()
        restored_wq = np.asarray(eng.model_agent.host_params()['layers']['wq'])
        np.testing.assert_allclose(restored_wq, base_wq, atol=1e-5)
        again = _gen(eng, 3, prompt)
        assert again == base                     # bit-for-bit behavior restored
    finally:
        eng.close()


@pytest.fixture()
def peft_dir2(tmp_path_factory):
    """A second, different adapter (q/v targets, r=2, different seed)."""
    from safetensors.numpy import save_file

    path = tmp_path_factory.mktemp('peft2')
    r, H, nh, nkv, hd = 2, 64, 4, 2, 16
    with open(path / 'adapter_config.json', 'w') as f:
        json.dump({'r': r, 'lora_alpha': 4, 'peft_type': 'LORA',
                   'target_modules': ['q_proj', 'v_proj']}, f)
    rng = np.random.RandomState(9)
    tensors = {}
    for layer in range(2):
        p = f'base_model.model.model.layers.{layer}.'
        tensors[p + 'self_attn.q_proj.lora_A.weight'] = \
            rng.randn(r, H).astype(np.float32) * 0.1
        tensors[p + 'self_attn.q_proj.lora_B.weight'] = \
            rng.randn(nh * hd, r).astype(np.float32) * 0.1
        tensors[p + 'self_attn.v_proj.lora_A.weight'] = \
            rng.randn(r, H).astype(np.float32) * 0.1
        tensors[p + 'self_attn.v_proj.lora_B.weight'] = \
            rng.randn(nkv * hd, r).astype(np.float32) * 0.1
    save_file(tensors, str(path / 'adapter_model.safetensors'))
    return str(path)


def _gen_adapter(eng, sid, prompt, adapter_name=None, n=5):
    from lmdeploy_tpu.messages import GenerationConfig

    async def run():
        inst = eng.create_instance()
        out = await inst.async_infer(
            sid, prompt, GenerationConfig(max_new_tokens=n, ignore_eos=True,
                                          adapter_name=adapter_name))
        await inst.async_end(sid)
        return out.token_ids

    loop = asyncio.new_event_loop()
    try:
        return loop.run_until_complete(run())
    finally:
        loop.close()


def test_slora_multiplexing(tiny_model_dir, peft_dir, peft_dir2):
    """Per-request adapters: slot selection must match the merged-adapter
    outputs, slot 0 must match the base model, mixed ranks must coexist."""
    from lmdeploy_tpu.engine.engine import Engine
    from lmdeploy_tpu.messages import TpuEngineConfig

    cfg = dict(dtype='float32', block_size=16, num_gpu_blocks=32,
               max_batch_size=4, session_len=128, max_prefill_token_num=64)
    prompt = [1, 17, 42, 99, 7]

    # ground truths from the merge-based single-adapter path
    eng = Engine.from_pretrained(tiny_model_dir, TpuEngineConfig(**cfg))
    base = _gen(eng, 1, prompt)
    eng.load_lora('a', peft_dir)
    eng.activate_lora('a')
    merged_a = _gen(eng, 2, prompt)
    eng.load_lora('b', peft_dir2)
    eng.activate_lora('b')
    merged_b = _gen(eng, 3, prompt)
    eng.close()

    # multiplexed engine with both adapters as slots
    eng = Engine.from_pretrained(
        tiny_model_dir,
        TpuEngineConfig(**cfg, adapters={'a': peft_dir, 'b': peft_dir2}))
    try:
        assert _gen_adapter(eng, 10, prompt, None) == base
        assert _gen_adapter(eng, 11, prompt, 'a') == merged_a
        assert _gen_adapter(eng, 12, prompt, 'b') == merged_b
        assert merged_a != merged_b
        # unknown adapter -> clean error naming the loaded ones
        with pytest.raises(ValueError, match="unknown adapter"):
            _gen_adapter(eng, 13, prompt, 'nope')
    finally:
        eng.close()


def test_slora_concurrent_mixed_batch(tiny_model_dir, peft_dir, peft_dir2):
    """Different adapters decoding concurrently in ONE batch stay independent."""
    from lmdeploy_tpu.engine.engine import Engine
    from lmdeploy_tpu.messages import GenerationConfig, TpuEngineConfig

    cfg = TpuEngineConfig(dtype='float32', block_size=16, num_gpu_blocks=32,
                          max_batch_size=4, session_len=128,
                          max_prefill_token_num=64,
                          adapters={'a': peft_dir, 'b': peft_dir2})
    eng = Engine.from_pretrained(tiny_model_dir, cfg)
    prompt = [1, 17, 42, 99, 7]

    async def run():
        inst = eng.create_instance()

        async def one(sid, name):
            out = await inst.async_infer(
                sid, prompt, GenerationConfig(max_new_tokens=5, ignore_eos=True,
                                              adapter_name=name))
            await inst.async_end(sid)
            return out.token_ids

        return await asyncio.gather(one(21, None), one(22, 'a'), one(23, 'b'))

    loop = asyncio.new_event_loop()
    try:
        got_none, got_a, got_b = loop.run_until_complete(run())
    finally:
        loop.close()
        eng.close()
    # concurrent batched results identical to the solo runs
    assert got_none == _gen_adapter_solo(tiny_model_dir, prompt, None,
                                         peft_dir, peft_dir2)
    assert got_a == _gen_adapter_solo(tiny_model_dir, prompt, 'a',
                                      peft_dir, peft_dir2)
    assert got_b == _gen_adapter_solo(tiny_model_dir, prompt, 'b',
                                      peft_dir, peft_dir2)


def _gen_adapter_solo(model_dir, prompt, name, p1, p2):
    from lmdeploy_tpu.engine.engine import Engine
    from lmdeploy_tpu.messages import TpuEngineConfig
    eng = Engine.from_pretrained(
        model_dir,
        TpuEngineConfig(dtype='float32', block_size=16, num_gpu_blocks=32,
                        max_batch_size=4, session_len=128,
                        max_prefill_token_num=64,
                        adapters={'a': p1, 'b': p2}))
    try:
        return _gen_adapter(eng, 99, prompt, name)
    finally:
        eng.close()
