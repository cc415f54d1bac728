"""GLM-5.2 (glm_moe_dsa) tests: MLA + DeepSeek-MoE with shared DSA layers.

Reference analog: ``lmdeploy/pytorch/models/glm_moe_dsa.py``.  Invariants:

  * ``index_topk >= context`` selects every token, so the output must be
    token-identical to the dense DeepseekV2 path on the same weights — for
    full AND 'shared' indexer layers alike (reuse of an all-true selection
    is still an all-true selection);
  * chunked prefill must equal one-shot prefill (the shared-index scan
    carry is rebuilt per forward, never across chunks);
  * a small top-k engages real sparsity (differs from dense, deterministic).
"""
import asyncio
import json
import shutil

import numpy as np
import pytest

GLM_DSA_CFG = {
    'architectures': ['GlmMoeDsaForCausalLM'],
    'model_type': 'glm_moe_dsa',
    'hidden_size': 64,
    'intermediate_size': 128,
    'moe_intermediate_size': 32,
    'num_hidden_layers': 4,
    'first_k_dense_replace': 1,
    'n_routed_experts': 4,
    'n_shared_experts': 1,
    'num_experts_per_tok': 2,
    'norm_topk_prob': True,
    'routed_scaling_factor': 1.0,
    'scoring_func': 'sigmoid',
    'num_attention_heads': 4,
    'num_key_value_heads': 4,
    'qk_nope_head_dim': 16,
    'qk_rope_head_dim': 8,
    'qk_head_dim': 24,
    'v_head_dim': 16,
    'q_lora_rank': 32,
    'kv_lora_rank': 24,
    'index_n_heads': 4,
    'index_head_dim': 16,
    'index_topk': 256,
    'indexer_types': ['full', 'shared', 'full', 'shared'],
    'vocab_size': 128,
    'max_position_embeddings': 256,
    'rms_norm_eps': 1e-6,
    'rope_theta': 10000.0,
    'bos_token_id': 1,
    'eos_token_id': 2,
    'tie_word_embeddings': False,
    'torch_dtype': 'float32',
}


@pytest.fixture(scope='module')
def glm_dsa_dir(tmp_path_factory):
    from safetensors.numpy import save_file

    import sys
    sys.path.insert(0, 'tests')
    from conftest import make_tiny_tokenizer

    path = tmp_path_factory.mktemp('tiny_glm_dsa')
    with open(path / 'config.json', 'w') as f:
        json.dump(GLM_DSA_CFG, f)
    make_tiny_tokenizer(str(path), vocab_size=128)
    rng = np.random.RandomState(31)
    c = GLM_DSA_CFG
    H, V = c['hidden_size'], c['vocab_size']
    nh, dn, dr, dv = (c['num_attention_heads'], c['qk_nope_head_dim'],
                      c['qk_rope_head_dim'], c['v_head_dim'])
    r, rq = c['kv_lora_rank'], c['q_lora_rank']
    hI, dI = c['index_n_heads'], c['index_head_dim']
    E, Ie = c['n_routed_experts'], c['moe_intermediate_size']
    t = {
        'model.embed_tokens.weight': rng.randn(V, H) * 0.02,
        'model.norm.weight': np.ones(H),
        'lm_head.weight': rng.randn(V, H) * 0.02,
    }
    for l in range(c['num_hidden_layers']):
        p = f'model.layers.{l}.'
        t.update({
            p + 'input_layernorm.weight': np.ones(H),
            p + 'post_attention_layernorm.weight': np.ones(H),
            p + 'self_attn.q_a_proj.weight': rng.randn(rq, H) * 0.05,
            p + 'self_attn.q_a_layernorm.weight': np.ones(rq),
            p + 'self_attn.q_b_proj.weight':
                rng.randn(nh * (dn + dr), rq) * 0.05,
            p + 'self_attn.kv_a_proj_with_mqa.weight':
                rng.randn(r + dr, H) * 0.05,
            p + 'self_attn.kv_a_layernorm.weight': np.ones(r),
            p + 'self_attn.kv_b_proj.weight':
                rng.randn(nh * (dn + dv), r) * 0.05,
            p + 'self_attn.o_proj.weight': rng.randn(H, nh * dv) * 0.05,
        })
        if c['indexer_types'][l] == 'full':
            t.update({
                p + 'self_attn.indexer.wq_b.weight':
                    rng.randn(hI * dI, rq) * 0.05,
                p + 'self_attn.indexer.wk.weight': rng.randn(dI, H) * 0.05,
                p + 'self_attn.indexer.k_norm.weight': np.ones(dI),
                p + 'self_attn.indexer.k_norm.bias': np.zeros(dI),
                p + 'self_attn.indexer.weights_proj.weight':
                    rng.randn(hI, H) * 0.05,
            })
        if l < c['first_k_dense_replace']:
            t.update({
                p + 'mlp.gate_proj.weight': rng.randn(128, H) * 0.05,
                p + 'mlp.up_proj.weight': rng.randn(128, H) * 0.05,
                p + 'mlp.down_proj.weight': rng.randn(H, 128) * 0.05,
            })
        else:
            t[p + 'mlp.gate.weight'] = rng.randn(E, H) * 0.05
            t[p + 'mlp.gate.e_score_correction_bias'] = np.zeros(E)
            for e in range(E):
                q = p + f'mlp.experts.{e}.'
                t[q + 'gate_proj.weight'] = rng.randn(Ie, H) * 0.05
                t[q + 'up_proj.weight'] = rng.randn(Ie, H) * 0.05
                t[q + 'down_proj.weight'] = rng.randn(H, Ie) * 0.05
            q = p + 'mlp.shared_experts.'
            t[q + 'gate_proj.weight'] = rng.randn(Ie, H) * 0.05
            t[q + 'up_proj.weight'] = rng.randn(Ie, H) * 0.05
            t[q + 'down_proj.weight'] = rng.randn(H, Ie) * 0.05
    t = {k: np.ascontiguousarray(v.astype(np.float32)) for k, v in t.items()}
    save_file(t, str(path / 'model.safetensors'))
    return str(path)


def _greedy(path, prompt, n, **over):
    from lmdeploy_tpu.engine.engine import Engine
    from lmdeploy_tpu.messages import GenerationConfig, TpuEngineConfig

    kw = dict(dtype='float32', block_size=16, num_gpu_blocks=64,
              max_batch_size=4, session_len=256, max_prefill_token_num=64)
    kw.update(over)
    eng = Engine.from_pretrained(path, TpuEngineConfig(**kw))
    try:
        async def run():
            inst = eng.create_instance()
            out = await inst.async_infer(
                1, prompt, GenerationConfig(max_new_tokens=n,
                                            ignore_eos=True))
            await inst.async_end(1)
            return list(out.token_ids)

        loop = asyncio.new_event_loop()
        try:
            return loop.run_until_complete(run())
        finally:
            loop.close()
    finally:
        eng.close()


def test_full_topk_equals_dense_mla(glm_dsa_dir, tmp_path):
    """topk >= ctx: every layer (full or shared) selects everything ->
    token-identical to the dense DeepseekV2 path on the same weights."""
    dense = str(tmp_path / 'as_v2')
    shutil.copytree(glm_dsa_dir, dense)
    cfg = json.load(open(f'{dense}/config.json'))
    cfg['architectures'] = ['DeepseekV2ForCausalLM']
    cfg['model_type'] = 'deepseek_v2'
    json.dump(cfg, open(f'{dense}/config.json', 'w'))

    rng = np.random.RandomState(7)
    prompt = rng.randint(3, 120, size=19).tolist()
    want = _greedy(dense, prompt, 8)
    got = _greedy(glm_dsa_dir, prompt, 8)
    assert got == want, (got, want)


def test_chunked_prefill_matches_one_shot(glm_dsa_dir, tmp_path):
    """Tiny prefill chunks (4 chunks for a 40-token prompt) with a SMALL
    topk must equal the one-shot prefill — the shared-index carry never
    leaks across chunk boundaries."""
    sparse = str(tmp_path / 'sparse')
    shutil.copytree(glm_dsa_dir, sparse)
    cfg = json.load(open(f'{sparse}/config.json'))
    cfg['index_topk'] = 8
    json.dump(cfg, open(f'{sparse}/config.json', 'w'))

    rng = np.random.RandomState(9)
    prompt = rng.randint(3, 120, size=40).tolist()
    one = _greedy(sparse, prompt, 8, max_prefill_token_num=64)
    chunked = _greedy(sparse, prompt, 8, max_prefill_token_num=10)
    assert one == chunked, (one, chunked)


@pytest.fixture(scope='module')
def glm_dsa_mtp_dir(glm_dsa_dir, tmp_path_factory):
    """The same checkpoint with a GLM-5.2 MTP (nextn) layer appended."""
    from safetensors.numpy import save_file
    from safetensors import safe_open

    path = tmp_path_factory.mktemp('tiny_glm_dsa_mtp')
    shutil.copytree(glm_dsa_dir, str(path), dirs_exist_ok=True)
    cfg = json.load(open(f'{path}/config.json'))
    cfg['num_nextn_predict_layers'] = 1
    json.dump(cfg, open(f'{path}/config.json', 'w'))

    t = {}
    with safe_open(f'{path}/model.safetensors', framework='np') as f:
        for k in f.keys():
            t[k] = f.get_tensor(k)
    rng = np.random.RandomState(41)
    c = GLM_DSA_CFG
    H = c['hidden_size']
    nh, dn, dr, dv = (c['num_attention_heads'], c['qk_nope_head_dim'],
                      c['qk_rope_head_dim'], c['v_head_dim'])
    r, rq = c['kv_lora_rank'], c['q_lora_rank']
    hI, dI = c['index_n_heads'], c['index_head_dim']
    E, Ie = c['n_routed_experts'], c['moe_intermediate_size']
    p = f"model.layers.{c['num_hidden_layers']}."
    t.update({
        p + 'enorm.weight': np.ones(H),
        p + 'hnorm.weight': np.ones(H),
        p + 'eh_proj.weight': rng.randn(H, 2 * H) * 0.05,
        p + 'shared_head.norm.weight': np.ones(H),
        p + 'input_layernorm.weight': np.ones(H),
        p + 'post_attention_layernorm.weight': np.ones(H),
        p + 'self_attn.q_a_proj.weight': rng.randn(rq, H) * 0.05,
        p + 'self_attn.q_a_layernorm.weight': np.ones(rq),
        p + 'self_attn.q_b_proj.weight': rng.randn(nh * (dn + dr), rq) * 0.05,
        p + 'self_attn.kv_a_proj_with_mqa.weight': rng.randn(r + dr, H) * 0.05,
        p + 'self_attn.kv_a_layernorm.weight': np.ones(r),
        p + 'self_attn.kv_b_proj.weight': rng.randn(nh * (dn + dv), r) * 0.05,
        p + 'self_attn.o_proj.weight': rng.randn(H, nh * dv) * 0.05,
        p + 'self_attn.indexer.wq_b.weight': rng.randn(hI * dI, rq) * 0.05,
        p + 'self_attn.indexer.wk.weight': rng.randn(dI, H) * 0.05,
        p + 'self_attn.indexer.k_norm.weight': np.ones(dI),
        p + 'self_attn.indexer.k_norm.bias': np.zeros(dI),
        p + 'self_attn.indexer.weights_proj.weight': rng.randn(hI, H) * 0.05,
        p + 'mlp.gate.weight': rng.randn(E, H) * 0.05,
        p + 'mlp.gate.e_score_correction_bias': np.zeros(E),
        p + 'mlp.shared_experts.gate_proj.weight': rng.randn(Ie, H) * 0.05,
        p + 'mlp.shared_experts.up_proj.weight': rng.randn(Ie, H) * 0.05,
        p + 'mlp.shared_experts.down_proj.weight': rng.randn(H, Ie) * 0.05,
    })
    for e in range(E):
        q = p + f'mlp.experts.{e}.'
        t[q + 'gate_proj.weight'] = rng.randn(Ie, H) * 0.05
        t[q + 'up_proj.weight'] = rng.randn(Ie, H) * 0.05
        t[q + 'down_proj.weight'] = rng.randn(H, Ie) * 0.05
    t = {k: np.ascontiguousarray(np.asarray(v, np.float32)) for k, v in t.items()}
    save_file(t, f'{path}/model.safetensors')
    return str(path)


def test_glm_dsa_mtp_greedy_matches_plain(glm_dsa_mtp_dir):
    """GLM-5.2 MTP speculation (DSA draft layer) reproduces plain greedy."""
    import asyncio as _a
    from lmdeploy_tpu.engine.engine import Engine
    from lmdeploy_tpu.messages import (GenerationConfig, SpeculativeConfig,
                                       TpuEngineConfig)

    def gen(spec):
        eng = Engine.from_pretrained(
            glm_dsa_mtp_dir,
            TpuEngineConfig(dtype='float32', block_size=16, num_gpu_blocks=64,
                            max_batch_size=4, session_len=256,
                            max_prefill_token_num=64),
            speculative_config=spec)
        try:
            if spec is not None:
                from lmdeploy_tpu.models.glm_moe_dsa import GlmMoeDsaMTP
                assert isinstance(eng.spec.draft_model, GlmMoeDsaMTP)

            async def run():
                inst = eng.create_instance()
                out = await inst.async_infer(
                    1, [1, 17, 42, 99, 7, 23, 55, 12],
                    GenerationConfig(max_new_tokens=12, ignore_eos=True))
                await inst.async_end(1)
                return list(out.token_ids)

            loop = _a.new_event_loop()
            try:
                return loop.run_until_complete(run())
            finally:
                loop.close()
        finally:
            eng.close()

    expect = gen(None)
    got = gen(SpeculativeConfig(method='deepseek_mtp',
                                num_speculative_tokens=2))
    assert got == expect, (got, expect)


def test_small_topk_sparse_and_deterministic(glm_dsa_dir, tmp_path):
    sparse = str(tmp_path / 'sparse2')
    shutil.copytree(glm_dsa_dir, sparse)
    cfg = json.load(open(f'{sparse}/config.json'))
    cfg['index_topk'] = 4
    json.dump(cfg, open(f'{sparse}/config.json', 'w'))

    rng = np.random.RandomState(11)
    prompt = rng.randint(3, 120, size=17).tolist()
    a = _greedy(sparse, prompt, 8)
    b = _greedy(sparse, prompt, 8)
    full = _greedy(glm_dsa_dir, prompt, 8)
    assert a == b and len(a) == 8
    assert a != full        # sparsity engaged (17 ctx > topk 4)
