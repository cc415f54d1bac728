"""Reward models: score head over the shared decoder, /pooling endpoint.

Golden reference: transformers Qwen2Model produces the hidden states; the
score head math is reimplemented in numpy from the same checkpoint tensors.
"""
import asyncio
import json
import os

import numpy as np
import pytest


@pytest.fixture(scope='module')
def qwen2_reward_dir(tmp_path_factory):
    from safetensors.numpy import save_file
    from conftest import make_tiny_tokenizer

    path = str(tmp_path_factory.mktemp('tiny_qwen2_reward'))
    cfg = {'architectures': ['Qwen2ForRewardModel'], 'model_type': 'qwen2',
           'hidden_size': 48, 'intermediate_size': 96, 'num_hidden_layers': 2,
           'num_attention_heads': 4, 'num_key_value_heads': 2, 'head_dim': 12,
           'vocab_size': 128, 'max_position_embeddings': 256,
           'rms_norm_eps': 1e-6, 'rope_theta': 10000.0,
           'torch_dtype': 'float32', 'tie_word_embeddings': False}
    json.dump(cfg, open(os.path.join(path, 'config.json'), 'w'))
    make_tiny_tokenizer(path, vocab_size=128)
    rng = np.random.RandomState(5)
    H, V = 48, 128
    nh, nkv, hd = 4, 2, 12
    t = {'model.embed_tokens.weight': rng.randn(V, H) * 0.02,
         'model.norm.weight': np.ones(H),
         'score.0.weight': rng.randn(H, H) * 0.1,
         'score.0.bias': rng.randn(H) * 0.1,
         'score.2.weight': rng.randn(1, H) * 0.1,
         'score.2.bias': rng.randn(1) * 0.1}
    for l in range(2):
        p = f'model.layers.{l}.'
        t[p + 'input_layernorm.weight'] = np.ones(H)
        t[p + 'post_attention_layernorm.weight'] = np.ones(H)
        t[p + 'self_attn.q_proj.weight'] = rng.randn(nh * hd, H) * 0.05
        t[p + 'self_attn.q_proj.bias'] = rng.randn(nh * hd) * 0.02
        t[p + 'self_attn.k_proj.weight'] = rng.randn(nkv * hd, H) * 0.05
        t[p + 'self_attn.k_proj.bias'] = rng.randn(nkv * hd) * 0.02
        t[p + 'self_attn.v_proj.weight'] = rng.randn(nkv * hd, H) * 0.05
        t[p + 'self_attn.v_proj.bias'] = rng.randn(nkv * hd) * 0.02
        t[p + 'self_attn.o_proj.weight'] = rng.randn(H, nh * hd) * 0.05
        t[p + 'mlp.gate_proj.weight'] = rng.randn(96, H) * 0.05
        t[p + 'mlp.up_proj.weight'] = rng.randn(96, H) * 0.05
        t[p + 'mlp.down_proj.weight'] = rng.randn(H, 96) * 0.05
    save_file({k: np.ascontiguousarray(np.asarray(v, np.float32))
               for k, v in t.items()}, os.path.join(path, 'model.safetensors'))
    return path


def _expected_scores(model_dir, prompts):
    """transformers Qwen2Model hidden states + numpy score head."""
    import torch
    from safetensors.numpy import load_file
    from transformers import Qwen2Config, Qwen2Model

    cfg = json.load(open(os.path.join(model_dir, 'config.json')))
    t = load_file(os.path.join(model_dir, 'model.safetensors'))
    hf_cfg = Qwen2Config(**{k: v for k, v in cfg.items()
                            if k not in ('architectures',)})
    model = Qwen2Model(hf_cfg).float().eval()
    state = {k[len('model.'):]: torch.tensor(v) for k, v in t.items()
             if k.startswith('model.')}
    missing, unexpected = model.load_state_dict(state, strict=False)
    assert not unexpected, unexpected
    out = []
    for ids in prompts:
        with torch.no_grad():
            h = model(torch.tensor([ids])).last_hidden_state[0, -1].numpy()
        s = np.maximum(h @ t['score.0.weight'].T + t['score.0.bias'], 0)
        out.append(float((s @ t['score.2.weight'].T + t['score.2.bias'])[0]))
    return out


def test_reward_scores_match_reference(qwen2_reward_dir):
    from lmdeploy_tpu import pipeline

    prompts = [[3, 17, 42, 99, 7], [5, 8, 13, 21, 34, 55, 89]]
    want = _expected_scores(qwen2_reward_dir, prompts)

    pipe = pipeline(qwen2_reward_dir)
    try:
        got = pipe.get_reward_score(prompts)
        single = pipe.get_reward_score(prompts[0])
    finally:
        pipe.close()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(single, want[:1], rtol=1e-4, atol=1e-4)


def test_pooling_endpoint(qwen2_reward_dir):
    from aiohttp.test_utils import TestClient, TestServer

    from lmdeploy_tpu.messages import TpuEngineConfig
    from lmdeploy_tpu.serve.api_server import create_app
    from lmdeploy_tpu.serve.async_engine import AsyncEngine

    eng = AsyncEngine(qwen2_reward_dir, backend_config=TpuEngineConfig(
        dtype='float32', block_size=16, num_gpu_blocks=32, max_batch_size=2,
        session_len=128, max_prefill_token_num=64))
    want = _expected_scores(qwen2_reward_dir, [[3, 17, 42, 99, 7]])

    async def run():
        client = TestClient(TestServer(create_app(eng, 'reward')))
        await client.start_server()
        try:
            r = await client.post('/pooling',
                                  json={'input': [[3, 17, 42, 99, 7]]})
            body = await r.json()
            assert r.status == 200
            np.testing.assert_allclose([body['data'][0]['data']], want,
                                       rtol=1e-4, atol=1e-4)
            r = await client.post('/pooling', json={'input': 42})
            assert r.status == 400
        finally:
            await client.close()
        return True

    loop = asyncio.new_event_loop()
    try:
        assert loop.run_until_complete(run())
    finally:
        eng.close()
        loop.close()


def test_reward_rejected_on_lm(tiny_model_dir):
    """Non-reward archs must reject get_reward_score (reference guard)."""
    from lmdeploy_tpu import pipeline

    pipe = pipeline(tiny_model_dir)
    try:
        with pytest.raises(ValueError):
            pipe.get_reward_score([[1, 2, 3]])
    finally:
        pipe.close()
