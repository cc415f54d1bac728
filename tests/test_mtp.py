"""DeepSeek MTP speculative decoding (method='deepseek_mtp').

The MTP module (the checkpoint's extra layer model.layers.{num_layers})
proposes draft tokens conditioned on the target's pre-final-norm features;
rejection sampling must reproduce the plain greedy output token-for-token
even with RANDOM MTP weights.
"""
import asyncio
import json

import numpy as np
import pytest

from test_deepseek import DS_CFG


@pytest.fixture(scope='module')
def ds_mtp_dir(tmp_path_factory):
    """Tiny DeepSeek-V2 checkpoint WITH an MTP layer appended."""
    import sys
    from safetensors.numpy import save_file
    sys.path.insert(0, __file__.rsplit('/', 1)[0])
    from conftest import make_tiny_tokenizer

    path = tmp_path_factory.mktemp('tiny_deepseek_mtp')
    cfg = dict(DS_CFG)
    cfg['num_nextn_predict_layers'] = 1
    with open(path / 'config.json', 'w') as f:
        json.dump(cfg, f)
    make_tiny_tokenizer(str(path), vocab_size=128)

    rng = np.random.RandomState(11)   # same stream as ds_model_dir for layers
    c = cfg
    H, V = c['hidden_size'], c['vocab_size']
    nh, dn, dr, dv, r = (c['num_attention_heads'], c['qk_nope_head_dim'],
                         c['qk_rope_head_dim'], c['v_head_dim'],
                         c['kv_lora_rank'])
    t = {
        'model.embed_tokens.weight': rng.randn(V, H) * 0.02,
        'model.norm.weight': np.ones(H),
        'lm_head.weight': rng.randn(V, H) * 0.02,
    }

    def layer_weights(p, moe):
        t[p + 'input_layernorm.weight'] = np.ones(H)
        t[p + 'post_attention_layernorm.weight'] = np.ones(H)
        t[p + 'self_attn.q_proj.weight'] = rng.randn(nh * (dn + dr), H) * 0.05
        t[p + 'self_attn.kv_a_proj_with_mqa.weight'] = \
            rng.randn(r + dr, H) * 0.05
        t[p + 'self_attn.kv_a_layernorm.weight'] = np.ones(r)
        t[p + 'self_attn.kv_b_proj.weight'] = rng.randn(nh * (dn + dv), r) * 0.05
        t[p + 'self_attn.o_proj.weight'] = rng.randn(H, nh * dv) * 0.05
        if not moe:
            I = c['intermediate_size']
            t[p + 'mlp.gate_proj.weight'] = rng.randn(I, H) * 0.05
            t[p + 'mlp.up_proj.weight'] = rng.randn(I, H) * 0.05
            t[p + 'mlp.down_proj.weight'] = rng.randn(H, I) * 0.05
        else:
            E, Ie = c['n_routed_experts'], c['moe_intermediate_size']
            t[p + 'mlp.gate.weight'] = rng.randn(E, H) * 0.05
            for e in range(E):
                q = p + f'mlp.experts.{e}.'
                t[q + 'gate_proj.weight'] = rng.randn(Ie, H) * 0.05
                t[q + 'up_proj.weight'] = rng.randn(Ie, H) * 0.05
                t[q + 'down_proj.weight'] = rng.randn(H, Ie) * 0.05
            Is = c['n_shared_experts'] * Ie
            q = p + 'mlp.shared_experts.'
            t[q + 'gate_proj.weight'] = rng.randn(Is, H) * 0.05
            t[q + 'up_proj.weight'] = rng.randn(Is, H) * 0.05
            t[q + 'down_proj.weight'] = rng.randn(H, Is) * 0.05

    n_layers = c['num_hidden_layers']
    for l in range(n_layers):
        layer_weights(f'model.layers.{l}.',
                      moe=l >= c['first_k_dense_replace'])
    # the MTP module: extra layer + conditioning projections + shared head
    p = f'model.layers.{n_layers}.'
    t[p + 'enorm.weight'] = np.ones(H)
    t[p + 'hnorm.weight'] = np.ones(H)
    t[p + 'eh_proj.weight'] = rng.randn(H, 2 * H) * 0.05
    t[p + 'shared_head.norm.weight'] = np.ones(H)
    layer_weights(p, moe=True)

    t = {k: np.ascontiguousarray(np.asarray(v, np.float32)) for k, v in t.items()}
    save_file(t, str(path / 'model.safetensors'))
    return str(path)


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


def test_mtp_greedy_matches_plain(ds_mtp_dir):
    """Random MTP weights propose garbage; rejection sampling must still
    reproduce plain greedy decoding token-for-token."""
    from lmdeploy_tpu.messages import SpeculativeConfig

    prompt = [1, 17, 42, 99, 7, 23, 55, 12]
    plain = _engine(ds_mtp_dir)
    try:
        expect = _gen(plain, 1, prompt, 12)
    finally:
        plain.close()

    spec = _engine(ds_mtp_dir,
                   SpeculativeConfig(method='deepseek_mtp',
                                     num_speculative_tokens=3))
    try:
        got = _gen(spec, 1, prompt, 12)
        assert spec.spec.method == 'deepseek_mtp'
        assert spec.spec.draft_kv.shape[0] == 1       # one MTP layer
        from lmdeploy_tpu.models.deepseek import DeepseekMTP
        assert isinstance(spec.spec.draft_model, DeepseekMTP)
    finally:
        spec.close()
    assert got == expect, (got, expect)


def test_mtp_concurrent_batch(ds_mtp_dir):
    """Several concurrent sessions under MTP speculation all match their
    plain-decode outputs."""
    from lmdeploy_tpu.messages import SpeculativeConfig

    rng = np.random.RandomState(5)
    prompts = [rng.randint(3, 120, size=n).tolist() for n in (6, 9, 13)]

    plain = _engine(ds_mtp_dir)
    try:
        expect = [_gen(plain, 10 + i, p, 8) for i, p in enumerate(prompts)]
    finally:
        plain.close()

    spec = _engine(ds_mtp_dir,
                   SpeculativeConfig(method='deepseek_mtp',
                                     num_speculative_tokens=2))
    try:
        got = [_gen(spec, 20 + i, p, 8) for i, p in enumerate(prompts)]
    finally:
        spec.close()
    assert got == expect


@pytest.fixture(scope='module')
def glm4_mtp_dir(tmp_path_factory):
    """Tiny GLM-4.5-MoE checkpoint WITH its nextn MTP layer appended."""
    import sys
    from safetensors.numpy import save_file
    sys.path.insert(0, __file__.rsplit('/', 1)[0])
    from conftest import make_tiny_tokenizer

    path = tmp_path_factory.mktemp('tiny_glm4moe_mtp')
    cfg = {
        'architectures': ['Glm4MoeForCausalLM'], 'model_type': 'glm4_moe',
        'hidden_size': 48, 'intermediate_size': 96,
        'moe_intermediate_size': 32, 'num_hidden_layers': 2,
        'first_k_dense_replace': 1, 'num_attention_heads': 4,
        'num_key_value_heads': 2, 'head_dim': 16,
        'partial_rotary_factor': 0.5, 'attention_bias': False,
        'use_qk_norm': True, 'n_routed_experts': 4, 'n_shared_experts': 1,
        'num_experts_per_tok': 2, 'n_group': 2, 'topk_group': 1,
        'norm_topk_prob': True, 'routed_scaling_factor': 1.0,
        'num_nextn_predict_layers': 1,
        'vocab_size': 128, 'max_position_embeddings': 256,
        'rms_norm_eps': 1e-5, 'rope_theta': 10000.0,
        'bos_token_id': 1, 'eos_token_id': 2, 'tie_word_embeddings': False,
        'torch_dtype': 'float32',
    }
    with open(path / 'config.json', 'w') as f:
        json.dump(cfg, f)
    make_tiny_tokenizer(str(path), vocab_size=128)

    rng = np.random.RandomState(33)
    H, V, nh, nkv, D = 48, 128, 4, 2, 16

    t = {'model.embed_tokens.weight': rng.randn(V, H) * 0.02,
         'model.norm.weight': np.ones(H),
         'lm_head.weight': rng.randn(V, H) * 0.02}

    def attn(p):
        t[p + 'input_layernorm.weight'] = np.ones(H)
        t[p + 'post_attention_layernorm.weight'] = np.ones(H)
        t[p + 'self_attn.q_proj.weight'] = rng.randn(nh * D, H) * 0.05
        t[p + 'self_attn.k_proj.weight'] = rng.randn(nkv * D, H) * 0.05
        t[p + 'self_attn.v_proj.weight'] = rng.randn(nkv * D, H) * 0.05
        t[p + 'self_attn.o_proj.weight'] = rng.randn(H, nh * D) * 0.05
        t[p + 'self_attn.q_norm.weight'] = np.ones(D)
        t[p + 'self_attn.k_norm.weight'] = np.ones(D)

    def dense(p):
        t[p + 'mlp.gate_proj.weight'] = rng.randn(96, H) * 0.05
        t[p + 'mlp.up_proj.weight'] = rng.randn(96, H) * 0.05
        t[p + 'mlp.down_proj.weight'] = rng.randn(H, 96) * 0.05

    def moe(p):
        t[p + 'mlp.gate.weight'] = rng.randn(4, H) * 0.05
        t[p + 'mlp.gate.e_score_correction_bias'] = np.zeros(4)
        for e in range(4):
            q = p + f'mlp.experts.{e}.'
            t[q + 'gate_proj.weight'] = rng.randn(32, H) * 0.05
            t[q + 'up_proj.weight'] = rng.randn(32, H) * 0.05
            t[q + 'down_proj.weight'] = rng.randn(H, 32) * 0.05
        q = p + 'mlp.shared_experts.'
        t[q + 'gate_proj.weight'] = rng.randn(32, H) * 0.05
        t[q + 'up_proj.weight'] = rng.randn(32, H) * 0.05
        t[q + 'down_proj.weight'] = rng.randn(H, 32) * 0.05

    attn('model.layers.0.'); dense('model.layers.0.')
    attn('model.layers.1.'); moe('model.layers.1.')
    # MTP nextn layer (index 2): conditioning + one GQA+MoE block
    p = 'model.layers.2.'
    t[p + 'enorm.weight'] = np.ones(H)
    t[p + 'hnorm.weight'] = np.ones(H)
    t[p + 'eh_proj.weight'] = rng.randn(H, 2 * H) * 0.05
    t[p + 'shared_head.norm.weight'] = np.ones(H)
    attn(p); moe(p)
    t = {k: np.ascontiguousarray(v.astype(np.float32)) for k, v in t.items()}
    save_file(t, str(path / 'model.safetensors'))
    return str(path)


def test_glm4_moe_mtp_greedy_matches_plain(glm4_mtp_dir):
    """GLM-4.5 nextn MTP speculation reproduces plain greedy exactly."""
    from lmdeploy_tpu.messages import SpeculativeConfig

    prompt = [3, 17, 42, 99, 7, 23, 55]
    plain = _engine(glm4_mtp_dir)
    try:
        expect = _gen(plain, 1, prompt, 12)
    finally:
        plain.close()

    spec = _engine(glm4_mtp_dir,
                   SpeculativeConfig(method='deepseek_mtp',
                                     num_speculative_tokens=2))
    try:
        from lmdeploy_tpu.models.glm4_moe import Glm4MoeMTP
        assert isinstance(spec.spec.draft_model, Glm4MoeMTP)
        got = _gen(spec, 1, prompt, 12)
    finally:
        spec.close()
    assert got == expect, (got, expect)
