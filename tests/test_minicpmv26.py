"""MiniCPM-V 2.6: sliced SigLIP tower + perceiver resampler + Qwen2 LM.

Reference: lmdeploy/pytorch/models/minicpmv26.py (+ vl/model/minicpmv.py).
Goldens: LM path vs a Qwen2 twin built from the same tensors; tower +
resampler vs a torch twin of the documented math; e2e slice-count and
placeholder expansion through the engine.
"""
import asyncio
import json
import os

import numpy as np
import pytest

H, I, V, NH, NKV, HD, L = 64, 96, 128, 4, 2, 16, 2
VIS = {
    'hidden_size': 32, 'num_hidden_layers': 2, 'num_attention_heads': 2,
    'intermediate_size': 48, 'patch_size': 14, 'image_size': 56,
    'num_channels': 3,
}
QUERY_NUM = 8
LM_CFG = {
    'architectures': ['Qwen2ForCausalLM'], 'model_type': 'qwen2',
    'hidden_size': H, 'intermediate_size': I, 'num_hidden_layers': L,
    'num_attention_heads': NH, 'num_key_value_heads': NKV, 'head_dim': HD,
    'vocab_size': V, 'max_position_embeddings': 512,
    'rms_norm_eps': 1e-6, 'rope_theta': 10000.0, 'eos_token_id': 2,
    'attention_bias': True, 'tie_word_embeddings': False,
    'torch_dtype': 'float32',
}


def _lm_tensors(rng):
    t = {
        'model.embed_tokens.weight': rng.randn(V, H) * 0.02,
        'model.norm.weight': np.ones(H),
        'lm_head.weight': rng.randn(V, H) * 0.02,
    }
    for l in range(L):
        p = f'model.layers.{l}.'
        t[p + 'input_layernorm.weight'] = np.ones(H)
        t[p + 'post_attention_layernorm.weight'] = np.ones(H)
        t[p + 'self_attn.q_proj.weight'] = rng.randn(NH * HD, H) * 0.02
        t[p + 'self_attn.q_proj.bias'] = rng.randn(NH * HD) * 0.01
        t[p + 'self_attn.k_proj.weight'] = rng.randn(NKV * HD, H) * 0.02
        t[p + 'self_attn.k_proj.bias'] = rng.randn(NKV * HD) * 0.01
        t[p + 'self_attn.v_proj.weight'] = rng.randn(NKV * HD, H) * 0.02
        t[p + 'self_attn.v_proj.bias'] = rng.randn(NKV * HD) * 0.01
        t[p + 'self_attn.o_proj.weight'] = rng.randn(H, NH * HD) * 0.02
        t[p + 'mlp.gate_proj.weight'] = rng.randn(I, H) * 0.02
        t[p + 'mlp.up_proj.weight'] = rng.randn(I, H) * 0.02
        t[p + 'mlp.down_proj.weight'] = rng.randn(H, I) * 0.02
    return t


@pytest.fixture(scope='module')
def minicpmv_dir(tmp_path_factory):
    import torch
    from safetensors.numpy import save_file
    from transformers import SiglipVisionConfig, SiglipVisionModel

    from conftest import make_tiny_tokenizer

    path = tmp_path_factory.mktemp('minicpmv')
    rng = np.random.RandomState(17)
    lm = _lm_tensors(rng)
    tensors = {'llm.' + k: v for k, v in lm.items()}

    torch.manual_seed(5)
    vpm = SiglipVisionModel(SiglipVisionConfig(**VIS)).float().eval()
    for k, v in vpm.state_dict().items():
        tensors['vpm.' + k[len('vision_model.'):]
                if k.startswith('vision_model.') else 'vpm.' + k] = v.numpy()
    tensors = {k.replace('vpm.head.', 'vpm_unused.head.'): v
               for k, v in tensors.items()}
    r = 'resampler.'
    tensors[r + 'query'] = rng.randn(QUERY_NUM, H) * 0.1
    tensors[r + 'kv_proj.weight'] = rng.randn(H, VIS['hidden_size']) * 0.05
    tensors[r + 'attn.in_proj_weight'] = rng.randn(3 * H, H) * 0.05
    tensors[r + 'attn.in_proj_bias'] = rng.randn(3 * H) * 0.01
    tensors[r + 'attn.out_proj.weight'] = rng.randn(H, H) * 0.05
    tensors[r + 'attn.out_proj.bias'] = rng.randn(H) * 0.01
    tensors[r + 'ln_q.weight'] = np.ones(H) + rng.randn(H) * 0.01
    tensors[r + 'ln_q.bias'] = rng.randn(H) * 0.01
    tensors[r + 'ln_kv.weight'] = np.ones(H) + rng.randn(H) * 0.01
    tensors[r + 'ln_kv.bias'] = rng.randn(H) * 0.01
    tensors[r + 'ln_post.weight'] = np.ones(H) + rng.randn(H) * 0.01
    tensors[r + 'ln_post.bias'] = rng.randn(H) * 0.01
    tensors[r + 'proj'] = rng.randn(H, H) * 0.05
    tensors = {k: np.ascontiguousarray(np.asarray(v, np.float32))
               for k, v in tensors.items()}
    save_file(tensors, str(path / 'model.safetensors'))

    cfg = dict(LM_CFG)
    cfg['architectures'] = ['MiniCPMV']
    cfg['model_type'] = 'minicpmv'
    cfg['vision_config'] = VIS
    cfg['query_num'] = QUERY_NUM
    cfg['image_token_id'] = 123
    with open(path / 'config.json', 'w') as f:
        json.dump(cfg, f)
    make_tiny_tokenizer(str(path), vocab_size=128)

    twin_path = tmp_path_factory.mktemp('minicpmv_lm_twin')
    with open(twin_path / 'config.json', 'w') as f:
        json.dump(LM_CFG, f)
    save_file({k: np.ascontiguousarray(np.asarray(v, np.float32))
               for k, v in lm.items()}, str(twin_path / 'model.safetensors'))
    make_tiny_tokenizer(str(twin_path), vocab_size=128)
    return str(path), str(twin_path)


def _greedy(model_dir, prompt, n, mm_data=None):
    from lmdeploy_tpu.engine.engine import Engine
    from lmdeploy_tpu.messages import GenerationConfig, TpuEngineConfig
    cfg = TpuEngineConfig(dtype='float32', block_size=16, num_gpu_blocks=64,
                          max_batch_size=4, session_len=320,
                          max_prefill_token_num=128)
    eng = Engine.from_pretrained(model_dir, cfg)

    async def run():
        inst = eng.create_instance()
        out = await inst.async_infer(
            51, prompt, GenerationConfig(max_new_tokens=n, ignore_eos=True),
            mm_data=mm_data)
        await inst.async_end(51)
        return list(out.token_ids)

    loop = asyncio.new_event_loop()
    try:
        return loop.run_until_complete(run())
    finally:
        loop.close()
        eng.close()


def test_lm_path_matches_qwen2_twin(minicpmv_dir):
    path, twin = minicpmv_dir
    rng = np.random.RandomState(2)
    prompt = rng.randint(3, 120, size=10).tolist()
    assert _greedy(path, prompt, 8) == _greedy(twin, prompt, 8)


def test_resampler_matches_torch_twin(minicpmv_dir):
    import torch

    from lmdeploy_tpu.config import ModelConfig
    from lmdeploy_tpu.models import build_model
    from lmdeploy_tpu.models.minicpmv26 import sincos_2d
    from lmdeploy_tpu.weight_loader import load_vis_params_np

    path, _ = minicpmv_dir
    cfg = ModelConfig.from_pretrained(path, dtype='float32')
    model = build_model(cfg)
    vis = load_vis_params_np(model, path)

    rng = np.random.RandomState(6)
    gh, gw = 3, 5
    feats = rng.randn(gh * gw, VIS['hidden_size']).astype(np.float32)
    import jax.numpy as jnp
    got = np.asarray(model._resample(
        {k: jnp.asarray(v) for k, v in vis.items() if k != 'tower'},
        jnp.asarray(feats), gh, gw))

    from safetensors.numpy import load_file
    sd = load_file(os.path.join(path, 'model.safetensors'))
    r = 'resampler.'
    with torch.no_grad():
        def ln(x, w, b):
            return torch.nn.functional.layer_norm(
                x, (H,), torch.tensor(sd[r + w]), torch.tensor(sd[r + b]),
                eps=1e-6)

        x = torch.tensor(feats) @ torch.tensor(sd[r + 'kv_proj.weight']).T
        x = ln(x, 'ln_kv.weight', 'ln_kv.bias')
        q = ln(torch.tensor(sd[r + 'query']), 'ln_q.weight', 'ln_q.bias')
        pos = torch.tensor(sincos_2d(gh, gw, H))
        heads = max(H // 128, 1)
        hd = H // heads
        inw = torch.tensor(sd[r + 'attn.in_proj_weight'])
        inb = torch.tensor(sd[r + 'attn.in_proj_bias'])

        def split(v, n):
            return v.reshape(n, heads, hd).permute(1, 0, 2)

        qh = split(q @ inw[:H].T + inb[:H], QUERY_NUM) / hd ** 0.5
        kh = split((x + pos) @ inw[H:2 * H].T + inb[H:2 * H], gh * gw)
        vh = split(x @ inw[2 * H:].T + inb[2 * H:], gh * gw)
        att = torch.einsum('hqd,hkd->hqk', qh, kh).softmax(-1)
        o = torch.einsum('hqk,hkd->hqd', att, vh)
        o = o.permute(1, 0, 2).reshape(QUERY_NUM, H)
        o = o @ torch.tensor(sd[r + 'attn.out_proj.weight']).T \
            + torch.tensor(sd[r + 'attn.out_proj.bias'])
        o = ln(o, 'ln_post.weight', 'ln_post.bias')
        want = (o @ torch.tensor(sd[r + 'proj'])).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_tower_rect_matches_siglip_square(minicpmv_dir):
    """On an exactly-square native-size view, forward_rect with identity
    bucketing must match the stock SigLIP square forward."""
    from lmdeploy_tpu.config import ModelConfig
    from lmdeploy_tpu.models import build_model
    from lmdeploy_tpu.weight_loader import load_vis_params_np

    path, _ = minicpmv_dir
    cfg = ModelConfig.from_pretrained(path, dtype='float32')
    model = build_model(cfg)
    vis = load_vis_params_np(model, path)
    import jax.numpy as jnp
    tower = model.tower
    rng = np.random.RandomState(8)
    S = VIS['image_size']
    img = rng.rand(S, S, 3).astype(np.float32)
    patches, pos_ids, (gh, gw) = tower.patches_of(
        img, model.image_mean, model.image_std)
    assert (gh, gw) == (tower.grid, tower.grid)
    np.testing.assert_array_equal(np.asarray(pos_ids),
                                  np.arange(tower.grid ** 2))
    tp = {k: jnp.asarray(v) for k, v in vis['tower'].items()
          if not isinstance(v, dict)}
    tp['layers'] = {k: jnp.asarray(v) for k, v in vis['tower']['layers'].items()}
    got = np.asarray(tower.forward_rect(tp, jnp.asarray(patches),
                                        jnp.asarray(pos_ids)))
    norm = (img - np.asarray(model.image_mean)) / np.asarray(model.image_std)
    want = np.asarray(tower.forward(tp, jnp.asarray(norm[None])))[0]
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_e2e_image_injection_and_slicing(minicpmv_dir):
    from PIL import Image

    from lmdeploy_tpu.models.minicpmv26 import best_grid, slice_views
    path, _ = minicpmv_dir
    # small image: no slicing; large: sliced
    assert best_grid(300, 300) == (1, 1)
    cols, rows = best_grid(1400, 700)
    assert cols * rows >= 2
    views = slice_views(Image.new('RGB', (1400, 700)), 9)
    assert len(views) == 1 + cols * rows

    rng = np.random.RandomState(4)
    img = Image.fromarray(rng.randint(0, 255, (300, 300, 3), np.uint8))
    prompt = [5, 9, 123, 17, 21]
    out = _greedy(path, prompt, 6, mm_data=[img])
    assert len(out) == 6
    assert out == _greedy(path, prompt, 6, mm_data=[img])
