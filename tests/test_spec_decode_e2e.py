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


@pytest.fixture(scope='module')
def eagle_dir(tmp_path_factory):
    """Random EAGLE head checkpoint matching the tiny llama geometry."""
    import json

    from safetensors.numpy import save_file

    path = tmp_path_factory.mktemp('tiny_eagle')
    cfg = {'architectures': ['LlamaForCausalLM'], 'model_type': 'llama',
           'hidden_size': 64, 'intermediate_size': 128,
           'num_hidden_layers': 1, 'num_attention_heads': 4,
           'num_key_value_heads': 2, 'head_dim': 16, 'vocab_size': 256,
           'max_position_embeddings': 512, 'rms_norm_eps': 1e-6,
           'rope_theta': 10000.0, 'torch_dtype': 'float32'}
    with open(path / 'config.json', 'w') as f:
        json.dump(cfg, f)
    rng = np.random.RandomState(21)
    H, I, nh, nkv, hd = 64, 128, 4, 2, 16
    t = {
        'fc.weight': rng.randn(H, 2 * H) * 0.05,
        'layers.0.self_attn.q_proj.weight': rng.randn(nh * hd, H) * 0.05,
        'layers.0.self_attn.k_proj.weight': rng.randn(nkv * hd, H) * 0.05,
        'layers.0.self_attn.v_proj.weight': rng.randn(nkv * hd, H) * 0.05,
        'layers.0.self_attn.o_proj.weight': rng.randn(H, nh * hd) * 0.05,
        'layers.0.post_attention_layernorm.weight': np.ones(H),
        'layers.0.mlp.gate_proj.weight': rng.randn(I, H) * 0.05,
        'layers.0.mlp.up_proj.weight': rng.randn(I, H) * 0.05,
        'layers.0.mlp.down_proj.weight': rng.randn(H, I) * 0.05,
    }
    t = {k: np.ascontiguousarray(v.astype(np.float32)) for k, v in t.items()}
    save_file(t, str(path / 'model.safetensors'))
    return str(path)


def test_eagle_greedy_matches_plain(tiny_model_dir, eagle_dir):
    """A RANDOM eagle head proposes garbage; rejection sampling must still
    reproduce the plain greedy output token-for-token."""
    from lmdeploy_tpu.messages import SpeculativeConfig

    prompt = [1, 17, 42, 99, 7, 23, 55, 12]
    plain = _engine(tiny_model_dir)
    try:
        expect = _gen(plain, 1, prompt, 12)
    finally:
        plain.close()

    spec = _engine(tiny_model_dir,
                   SpeculativeConfig(method='eagle', model=eagle_dir,
                                     num_speculative_tokens=3))
    try:
        got = _gen(spec, 1, prompt, 12)
        assert spec.spec.method == 'eagle'
        assert spec.spec.draft_kv.shape[0] == 1       # one draft layer
    finally:
        spec.close()
    assert got == expect, (got, expect)


def test_eagle_concurrent_batch(tiny_model_dir, eagle_dir):
    from lmdeploy_tpu.messages import GenerationConfig, SpeculativeConfig

    rng = np.random.RandomState(8)
    prompts = [rng.randint(3, 250, size=n).tolist() for n in (5, 11)]
    plain = _engine(tiny_model_dir)
    try:
        expect = [_gen(plain, 40 + i, p, 6) for i, p in enumerate(prompts)]
    finally:
        plain.close()

    spec = _engine(tiny_model_dir,
                   SpeculativeConfig(method='eagle', model=eagle_dir,
                                     num_speculative_tokens=2))

    async def run():
        inst = spec.create_instance()

        async def one(sid, p):
            from lmdeploy_tpu.messages import GenerationConfig as GC
            out = await inst.async_infer(sid, p, GC(max_new_tokens=6,
                                                    ignore_eos=True))
            await inst.async_end(sid)
            return out.token_ids

        return await asyncio.gather(*[one(50 + i, p)
                                      for i, p in enumerate(prompts)])

    loop = asyncio.new_event_loop()
    try:
        got = loop.run_until_complete(run())
    finally:
        loop.close()
        spec.close()
    assert [list(g) for g in got] == [list(e) for e in expect]


@pytest.fixture(scope='module')
def eagle3_dir(tmp_path_factory):
    """Random EAGLE-3 head: 2H-wide qkv, 3*H fc, reduced draft vocab + d2t."""
    import json

    from safetensors.numpy import save_file

    path = tmp_path_factory.mktemp('tiny_eagle3')
    cfg = {'architectures': ['LlamaForCausalLMEagle3'], 'model_type': 'llama',
           'hidden_size': 64, 'intermediate_size': 128,
           'num_hidden_layers': 1, 'num_attention_heads': 4,
           'num_key_value_heads': 2, 'head_dim': 16, 'vocab_size': 256,
           'draft_vocab_size': 64, 'target_hidden_size': 64,
           'max_position_embeddings': 512, 'rms_norm_eps': 1e-6,
           'rope_theta': 10000.0, 'torch_dtype': 'float32'}
    with open(path / 'config.json', 'w') as f:
        json.dump(cfg, f)
    rng = np.random.RandomState(31)
    H, I, nh, nkv, hd, dV = 64, 128, 4, 2, 16, 64
    # d2t ckpt convention: OFFSETS (target_id - draft_id); keep ids in-range
    # and strictly increasing so they stay unique after the arange add
    d2t = np.sort(rng.choice(256, size=dV, replace=False)).astype(np.int64) \
        - np.arange(dV)
    t = {
        'embed_tokens.weight': rng.randn(256, H) * 0.05,
        'fc.weight': rng.randn(H, 3 * H) * 0.05,
        'midlayer.input_layernorm.weight': np.ones(H),
        'midlayer.hidden_norm.weight': np.ones(H),
        'midlayer.self_attn.q_proj.weight': rng.randn(nh * hd, 2 * H) * 0.05,
        'midlayer.self_attn.k_proj.weight': rng.randn(nkv * hd, 2 * H) * 0.05,
        'midlayer.self_attn.v_proj.weight': rng.randn(nkv * hd, 2 * H) * 0.05,
        'midlayer.self_attn.o_proj.weight': rng.randn(H, nh * hd) * 0.05,
        'midlayer.post_attention_layernorm.weight': np.ones(H),
        'midlayer.mlp.gate_proj.weight': rng.randn(I, H) * 0.05,
        'midlayer.mlp.up_proj.weight': rng.randn(I, H) * 0.05,
        'midlayer.mlp.down_proj.weight': rng.randn(H, I) * 0.05,
        'norm.weight': np.ones(H),
        'lm_head.weight': rng.randn(dV, H) * 0.05,
    }
    t = {k: np.ascontiguousarray(v.astype(np.float32)) for k, v in t.items()}
    t['d2t'] = np.ascontiguousarray(d2t)
    save_file(t, str(path / 'model.safetensors'))
    return str(path)


def test_eagle3_greedy_matches_plain(tiny_model_dir, eagle3_dir):
    """A RANDOM eagle3 head (reduced draft vocab, d2t translation) must still
    reproduce the plain greedy output token-for-token."""
    from lmdeploy_tpu.messages import SpeculativeConfig

    prompt = [1, 17, 42, 99, 7, 23, 55, 12]
    plain = _engine(tiny_model_dir)
    try:
        expect = _gen(plain, 1, prompt, 12)
    finally:
        plain.close()

    spec = _engine(tiny_model_dir,
                   SpeculativeConfig(method='eagle3', model=eagle3_dir,
                                     num_speculative_tokens=3))
    try:
        got = _gen(spec, 1, prompt, 12)
        assert spec.spec.method == 'eagle3'
        assert spec.spec.draft_kv.shape[0] == 1       # one draft layer
        assert spec.spec.draft_model.saw_embed        # ckpt shipped embed
        assert spec.spec.draft_model.draft_vocab == 64
    finally:
        spec.close()
    assert got == expect, (got, expect)


def test_eagle3_stochastic_seeded(tiny_model_dir, eagle3_dir):
    """Seeded sampling through the eagle3 path is deterministic given equal
    engine state (fresh engine per run: the draft cache/conditioning buffers
    legitimately depend on what earlier requests left in reused blocks)."""
    from lmdeploy_tpu.messages import GenerationConfig, SpeculativeConfig

    def gen_seeded():
        spec = _engine(tiny_model_dir,
                       SpeculativeConfig(method='eagle3', model=eagle3_dir,
                                         num_speculative_tokens=3))
        try:
            async def run():
                inst = spec.create_instance()
                out = await inst.async_infer(
                    10, [4, 9, 2, 77, 31],
                    GenerationConfig(max_new_tokens=10, ignore_eos=True,
                                     do_sample=True, temperature=0.7,
                                     top_k=20, random_seed=1234))
                await inst.async_end(10)
                return out.token_ids

            loop = asyncio.new_event_loop()
            try:
                return loop.run_until_complete(run())
            finally:
                loop.close()
        finally:
            spec.close()

    outs = [gen_seeded() for _ in range(2)]
    assert len(outs[0]) == 10
    assert outs[0] == outs[1]
