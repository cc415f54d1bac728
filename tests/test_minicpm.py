"""MiniCPM / MiniCPM3 muP-scaling tests (CPU jax).

The muP scalings are EXACTLY equivalent to weight folding (rms_norm is
scale-invariant in its input):

  * scale_emb          -> embed * scale_emb
  * scale_depth/sqrt(L) -> wo, (moe/mlp) down_proj * that factor
  * dim_model_base/H   -> lm_head * that factor

so a MiniCPM checkpoint and its folded Llama/DeepSeek twin must produce
token-identical greedy output — this pins the scaling hooks against the
already-golden-tested llama/deepseek paths.
"""
import glob
import json

import numpy as np
import pytest


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


def _fold(src, dst, arch, drop_keys=(), res_scale=1.0, emb_scale=1.0,
          logit_scale=1.0):
    """Copy ckpt with muP scalings folded into the weights + new arch."""
    import shutil

    from safetensors.numpy import load_file, save_file

    shutil.copytree(src, dst)
    cfg = json.load(open(f'{dst}/config.json'))
    cfg['architectures'] = [arch]
    for k in drop_keys:
        cfg.pop(k, None)
    json.dump(cfg, open(f'{dst}/config.json', 'w'))
    t = load_file(glob.glob(f'{dst}/*.safetensors')[0])
    out = {}
    for k, v in t.items():
        if k == 'model.embed_tokens.weight':
            v = v * emb_scale
        elif k == 'lm_head.weight':
            v = v * logit_scale
        elif k.endswith('o_proj.weight') or ('down_proj' in k):
            v = v * res_scale
        out[k] = np.ascontiguousarray(v)
    save_file(out, glob.glob(f'{dst}/*.safetensors')[0])


MUP = dict(scale_emb=4.0, scale_depth=1.4, dim_model_base=32)


@pytest.fixture(scope='module')
def minicpm_dir(tmp_path_factory):
    """Tiny MiniCPM (v2): llama weights + muP config fields."""
    import shutil

    from conftest import TINY_CFG, make_tiny_tokenizer
    from safetensors.numpy import save_file

    path = tmp_path_factory.mktemp('tiny_minicpm')
    cfg = dict(TINY_CFG, architectures=['MiniCPMForCausalLM'],
               model_type='minicpm', **MUP)
    with open(path / 'config.json', 'w') as f:
        json.dump(cfg, f)
    make_tiny_tokenizer(str(path))
    rng = np.random.RandomState(13)
    H, I, V = cfg['hidden_size'], cfg['intermediate_size'], cfg['vocab_size']
    nh, nkv, hd = (cfg['num_attention_heads'], cfg['num_key_value_heads'],
                   cfg['head_dim'])
    t = {'model.embed_tokens.weight': rng.randn(V, H) * 0.02,
         'model.norm.weight': np.ones(H),
         'lm_head.weight': rng.randn(V, H) * 0.02}
    for l in range(cfg['num_hidden_layers']):
        p = f'model.layers.{l}.'
        t.update({
            p + 'input_layernorm.weight': np.ones(H),
            p + 'post_attention_layernorm.weight': np.ones(H),
            p + 'self_attn.q_proj.weight': rng.randn(nh * hd, H) * 0.05,
            p + 'self_attn.k_proj.weight': rng.randn(nkv * hd, H) * 0.05,
            p + 'self_attn.v_proj.weight': rng.randn(nkv * hd, H) * 0.05,
            p + 'self_attn.o_proj.weight': rng.randn(H, nh * hd) * 0.05,
            p + 'mlp.gate_proj.weight': rng.randn(I, H) * 0.05,
            p + 'mlp.up_proj.weight': rng.randn(I, H) * 0.05,
            p + 'mlp.down_proj.weight': rng.randn(H, I) * 0.05,
        })
    t = {k: np.ascontiguousarray(v.astype(np.float32)) for k, v in t.items()}
    save_file(t, str(path / 'model.safetensors'))
    return str(path)


def test_minicpm_equals_folded_llama(minicpm_dir, tmp_path):
    L = json.load(open(f'{minicpm_dir}/config.json'))['num_hidden_layers']
    folded = str(tmp_path / 'folded_llama')
    _fold(minicpm_dir, folded, 'LlamaForCausalLM',
          drop_keys=('scale_emb', 'scale_depth', 'dim_model_base'),
          res_scale=MUP['scale_depth'] / np.sqrt(L),
          emb_scale=MUP['scale_emb'],
          logit_scale=MUP['dim_model_base'] / 64)      # H = 64
    prompt = [3, 17, 42, 99, 7, 23, 55]
    want = _greedy(folded, prompt, 8)
    got = _greedy(minicpm_dir, prompt, 8)
    assert got == want, (got, want)


@pytest.fixture(scope='module')
def minicpm3_dir(tmp_path_factory):
    """Tiny MiniCPM3: MLA (q_lora + kv_lora) + muP config fields."""
    from conftest import make_tiny_tokenizer
    from safetensors.numpy import save_file

    path = tmp_path_factory.mktemp('tiny_minicpm3')
    cfg = {
        'architectures': ['MiniCPM3ForCausalLM'], 'model_type': 'minicpm3',
        'hidden_size': 64, 'intermediate_size': 128, 'num_hidden_layers': 2,
        'num_attention_heads': 4, 'num_key_value_heads': 4,
        'qk_nope_head_dim': 16, 'qk_rope_head_dim': 8, 'v_head_dim': 16,
        'q_lora_rank': 32, 'kv_lora_rank': 24,
        'vocab_size': 128, 'max_position_embeddings': 256,
        'rms_norm_eps': 1e-6, 'rope_theta': 10000.0,
        'bos_token_id': 1, 'eos_token_id': 2, 'tie_word_embeddings': False,
        'torch_dtype': 'float32', **MUP,
    }
    with open(path / 'config.json', 'w') as f:
        json.dump(cfg, f)
    make_tiny_tokenizer(str(path), vocab_size=128)
    rng = np.random.RandomState(17)
    H, V = cfg['hidden_size'], cfg['vocab_size']
    nh, dn, dr, dv = 4, 16, 8, 16
    r, rq, I = cfg['kv_lora_rank'], cfg['q_lora_rank'], 128
    t = {'model.embed_tokens.weight': rng.randn(V, H) * 0.02,
         'model.norm.weight': np.ones(H),
         'lm_head.weight': rng.randn(V, H) * 0.02}
    for l in range(cfg['num_hidden_layers']):
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
            p + 'mlp.gate_proj.weight': rng.randn(I, H) * 0.05,
            p + 'mlp.up_proj.weight': rng.randn(I, H) * 0.05,
            p + 'mlp.down_proj.weight': rng.randn(H, I) * 0.05,
        })
    t = {k: np.ascontiguousarray(v.astype(np.float32)) for k, v in t.items()}
    save_file(t, str(path / 'model.safetensors'))
    return str(path)


def test_minicpm3_equals_folded_deepseek(minicpm3_dir, tmp_path):
    """MiniCPM3 == deepseek-v2 MLA with the muP scalings folded in (the
    deepseek twin runs all-dense via first_k_dense_replace == L)."""
    L = json.load(open(f'{minicpm3_dir}/config.json'))['num_hidden_layers']
    folded = str(tmp_path / 'folded_ds')
    _fold(minicpm3_dir, folded, 'DeepseekV2ForCausalLM',
          drop_keys=('scale_emb', 'scale_depth', 'dim_model_base'),
          res_scale=MUP['scale_depth'] / np.sqrt(L),
          emb_scale=MUP['scale_emb'],
          logit_scale=MUP['dim_model_base'] / 64)
    cfg = json.load(open(f'{folded}/config.json'))
    cfg['first_k_dense_replace'] = cfg['num_hidden_layers']
    json.dump(cfg, open(f'{folded}/config.json', 'w'))
    prompt = [3, 17, 42, 99, 7, 23, 55, 100, 12]
    want = _greedy(folded, prompt, 8)
    got = _greedy(minicpm3_dir, prompt, 8)
    assert got == want, (got, want)


def test_minicpm3_batch_deterministic(minicpm3_dir):
    a = _greedy(minicpm3_dir, [5, 9, 33, 72], 10)
    b = _greedy(minicpm3_dir, [5, 9, 33, 72], 10)
    assert a == b and len(a) == 10
