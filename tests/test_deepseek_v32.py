"""DeepSeek-V3.2 DSA sparse attention tests (CPU jax).

Key invariant: with ``index_topk >= context`` the causal top-k selects EVERY
valid token, so DSA must equal dense MLA attention EXACTLY — the same
checkpoint re-labeled DeepseekV2ForCausalLM (the indexer weights become
irrelevant) must produce token-identical greedy output.  A small top-k then
shows the sparse path actually engages (different, still deterministic).
"""
import glob
import json
import shutil

import numpy as np
import pytest

DSV32_CFG = {
    'architectures': ['DeepseekV32ForCausalLM'],
    'model_type': 'deepseek_v32',
    'hidden_size': 64,
    'intermediate_size': 128,
    'moe_intermediate_size': 32,
    'num_hidden_layers': 2,
    'first_k_dense_replace': 2,          # all dense: isolate the attention
    'num_attention_heads': 4,
    'num_key_value_heads': 4,
    'qk_nope_head_dim': 16,
    'qk_rope_head_dim': 8,
    'v_head_dim': 16,
    'q_lora_rank': 32,
    'kv_lora_rank': 24,
    'index_n_heads': 4,
    'index_head_dim': 16,
    'index_topk': 256,
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
def dsv32_dir(tmp_path_factory):
    from safetensors.numpy import save_file

    import sys
    sys.path.insert(0, 'tests')
    from conftest import make_tiny_tokenizer

    path = tmp_path_factory.mktemp('tiny_dsv32')
    with open(path / 'config.json', 'w') as f:
        json.dump(DSV32_CFG, f)
    make_tiny_tokenizer(str(path), vocab_size=128)
    rng = np.random.RandomState(29)
    c = DSV32_CFG
    H, V = c['hidden_size'], c['vocab_size']
    nh, dn, dr, dv = (c['num_attention_heads'], c['qk_nope_head_dim'],
                      c['qk_rope_head_dim'], c['v_head_dim'])
    r, rq = c['kv_lora_rank'], c['q_lora_rank']
    hI, dI = c['index_n_heads'], c['index_head_dim']
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
            p + 'self_attn.indexer.wq_b.weight':
                rng.randn(hI * dI, rq) * 0.05,
            p + 'self_attn.indexer.wk.weight': rng.randn(dI, H) * 0.05,
            p + 'self_attn.indexer.k_norm.weight': np.ones(dI),
            p + 'self_attn.indexer.k_norm.bias': np.zeros(dI),
            p + 'self_attn.indexer.weights_proj.weight':
                rng.randn(hI, H) * 0.05,
            p + 'mlp.gate_proj.weight': rng.randn(128, H) * 0.05,
            p + 'mlp.up_proj.weight': rng.randn(128, H) * 0.05,
            p + 'mlp.down_proj.weight': rng.randn(H, 128) * 0.05,
        })
    t = {k: np.ascontiguousarray(v.astype(np.float32)) for k, v in t.items()}
    save_file(t, str(path / 'model.safetensors'))
    return str(path)


def _greedy(path, prompt, n):
    import asyncio

    from lmdeploy_tpu.engine.engine import Engine
    from lmdeploy_tpu.messages import GenerationConfig, TpuEngineConfig

    cfg = TpuEngineConfig(dtype='float32', block_size=16, num_gpu_blocks=64,
                          max_batch_size=4, session_len=256,
                          max_prefill_token_num=64)
    eng = Engine.from_pretrained(path, cfg)
    try:
        async def run():
            inst = eng.create_instance()
            out = await inst.async_infer(
                1, prompt, GenerationConfig(max_new_tokens=n,
                                            ignore_eos=True))
            await inst.async_end(1)
            return out.token_ids

        loop = asyncio.new_event_loop()
        try:
            return loop.run_until_complete(run())
        finally:
            loop.close()
    finally:
        eng.close()


def test_hadamard_matches_matrix():
    """Butterfly FWHT == explicit H matrix, H[i,j] = (-1)^popcount(i&j)."""
    import jax
    jax.config.update('jax_platforms', 'cpu')
    from lmdeploy_tpu.models.deepseek_v32 import hadamard_transform

    d = 16
    H = np.array([[(-1) ** bin(i & j).count('1') for j in range(d)]
                  for i in range(d)], np.float32) * d ** -0.5
    rng = np.random.RandomState(0)
    x = rng.randn(3, d).astype(np.float32)
    got = np.asarray(hadamard_transform(x))
    np.testing.assert_allclose(got, x @ H.T, rtol=1e-5, atol=1e-5)


def test_dsa_full_topk_equals_dense_mla(dsv32_dir, tmp_path):
    """index_topk >= context: DSA selects everything -> token-identical to
    the dense DeepseekV2 path on the same weights."""
    dense = str(tmp_path / 'as_v2')
    shutil.copytree(dsv32_dir, dense)
    cfg = json.load(open(f'{dense}/config.json'))
    cfg['architectures'] = ['DeepseekV2ForCausalLM']
    cfg['model_type'] = 'deepseek_v2'
    json.dump(cfg, open(f'{dense}/config.json', 'w'))

    rng = np.random.RandomState(6)
    prompt = rng.randint(3, 120, size=17).tolist()
    want = _greedy(dense, prompt, 8)
    got = _greedy(dsv32_dir, prompt, 8)
    assert got == want, (got, want)


def test_dsa_small_topk_sparse_and_deterministic(dsv32_dir, tmp_path):
    """A tiny top-k actually restricts attention (output differs from dense)
    and stays deterministic across runs."""
    sparse = str(tmp_path / 'sparse')
    shutil.copytree(dsv32_dir, sparse)
    cfg = json.load(open(f'{sparse}/config.json'))
    cfg['index_topk'] = 4
    json.dump(cfg, open(f'{sparse}/config.json', 'w'))

    rng = np.random.RandomState(6)
    prompt = rng.randint(3, 120, size=17).tolist()
    a = _greedy(sparse, prompt, 8)
    b = _greedy(sparse, prompt, 8)
    full = _greedy(dsv32_dir, prompt, 8)
    assert a == b and len(a) == 8
    assert a != full        # sparsity engaged (17 ctx > topk 4)
