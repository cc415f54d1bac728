"""CogVLM2: dual vision/language experts + EVA2-CLIP tower + GLU adapter.

Reference: lmdeploy/pytorch/models/cogvlm.py.  Goldens: text-only greedy vs
a llama twin carrying the language-expert weights; multimodal greedy vs a
numpy dense reference implementing the dual-expert selection; tower vs a
torch twin of the EVA2-CLIP post-norm layers + GLU adapter.
"""
import asyncio
import json
import math
import os

import numpy as np
import pytest

H, I, V, NH, NKV, HD, L = 64, 96, 128, 4, 2, 16, 2
VIS = {
    'hidden_size': 32, 'num_hidden_layers': 2, 'num_heads': 2,
    'intermediate_size': 48, 'patch_size': 14, 'image_size': 56,
    'num_positions': 17, 'layer_norm_eps': 1e-6,
    'image_mean': [0.5, 0.5, 0.5], 'image_std': [0.5, 0.5, 0.5],
}
IMG_TOKEN = 122
COG_CFG = {
    'architectures': ['CogVLMForCausalLM'], 'model_type': 'cogvlm',
    'hidden_size': H, 'intermediate_size': I, 'num_hidden_layers': L,
    'num_attention_heads': NH, 'num_multi_query_heads': NKV,
    'vocab_size': V, 'max_position_embeddings': 512,
    'rms_norm_eps': 1e-6, 'rope_theta': 10000.0, 'eos_token_id': 2,
    'tie_word_embeddings': False, 'torch_dtype': 'float32',
    'vision_config': VIS, 'image_token_id': IMG_TOKEN,
}
LLAMA_CFG = {
    'architectures': ['LlamaForCausalLM'], 'model_type': 'llama',
    'hidden_size': H, 'intermediate_size': I, 'num_hidden_layers': L,
    'num_attention_heads': NH, 'num_key_value_heads': NKV, 'head_dim': HD,
    'vocab_size': V, 'max_position_embeddings': 512,
    'rms_norm_eps': 1e-6, 'rope_theta': 10000.0, 'eos_token_id': 2,
    'tie_word_embeddings': False, 'torch_dtype': 'float32',
}


def _tensors(rng):
    t = {
        'model.embed_tokens.weight': rng.randn(V, H) * 0.02,
        'model.norm.weight': np.ones(H),
        'lm_head.weight': rng.randn(V, H) * 0.02,
    }
    lang, vis = {}, {}
    qo, ko = NH * HD, NKV * HD
    for l in range(L):
        p = f'model.layers.{l}.'
        t[p + 'input_layernorm.weight'] = np.ones(H)
        t[p + 'post_attention_layernorm.weight'] = np.ones(H)
        a = p + 'self_attn.'
        lang_qkv = rng.randn(qo + 2 * ko, H) * 0.02
        vis_qkv = rng.randn(qo + 2 * ko, H) * 0.02
        t[a + 'language_expert_query_key_value.weight'] = lang_qkv
        t[a + 'vision_expert_query_key_value.weight'] = vis_qkv
        t[a + 'vision_expert_query_key_value.bias'] = \
            rng.randn(qo + 2 * ko) * 0.01
        t[a + 'language_expert_dense.weight'] = rng.randn(H, qo) * 0.02
        t[a + 'vision_expert_dense.weight'] = rng.randn(H, qo) * 0.02
        m = p + 'mlp.'
        for e in ('language_mlp', 'vision_mlp'):
            t[m + f'{e}.gate_proj.weight'] = rng.randn(I, H) * 0.02
            t[m + f'{e}.up_proj.weight'] = rng.randn(I, H) * 0.02
            t[m + f'{e}.down_proj.weight'] = rng.randn(H, I) * 0.02
    return t


def _vis_tensors(rng):
    W, P = VIS['hidden_size'], VIS['patch_size']
    b = 'model.vision.'
    t = {
        b + 'patch_embedding.proj.weight': rng.randn(W, 3, P, P) * 0.05,
        b + 'patch_embedding.proj.bias': rng.randn(W) * 0.01,
        b + 'patch_embedding.cls_embedding': rng.randn(1, W) * 0.02,
        b + 'patch_embedding.position_embedding.weight':
            rng.randn(VIS['num_positions'], W) * 0.02,
        b + 'linear_proj.linear_proj.weight': rng.randn(H, W) * 0.05,
        b + 'linear_proj.norm1.weight': np.ones(H) + rng.randn(H) * 0.01,
        b + 'linear_proj.norm1.bias': rng.randn(H) * 0.01,
        b + 'linear_proj.dense_h_to_4h.weight': rng.randn(I, H) * 0.05,
        b + 'linear_proj.gate_proj.weight': rng.randn(I, H) * 0.05,
        b + 'linear_proj.dense_4h_to_h.weight': rng.randn(H, I) * 0.05,
        b + 'boi': rng.randn(1, 1, H) * 0.1,
        b + 'eoi': rng.randn(1, 1, H) * 0.1,
        b + 'conv.weight': rng.randn(W, W, 2, 2) * 0.05,
        b + 'conv.bias': rng.randn(W) * 0.01,
    }
    for li in range(VIS['num_hidden_layers']):
        lb = b + f'transformer.layers.{li}.'
        t[lb + 'input_layernorm.weight'] = np.ones(W) + rng.randn(W) * 0.01
        t[lb + 'input_layernorm.bias'] = rng.randn(W) * 0.01
        t[lb + 'post_attention_layernorm.weight'] = \
            np.ones(W) + rng.randn(W) * 0.01
        t[lb + 'post_attention_layernorm.bias'] = rng.randn(W) * 0.01
        t[lb + 'attention.query_key_value.weight'] = rng.randn(3 * W, W) * 0.05
        t[lb + 'attention.query_key_value.bias'] = rng.randn(3 * W) * 0.01
        t[lb + 'attention.dense.weight'] = rng.randn(W, W) * 0.05
        t[lb + 'attention.dense.bias'] = rng.randn(W) * 0.01
        t[lb + 'mlp.fc1.weight'] = rng.randn(VIS['intermediate_size'], W) * 0.05
        t[lb + 'mlp.fc1.bias'] = rng.randn(VIS['intermediate_size']) * 0.01
        t[lb + 'mlp.fc2.weight'] = rng.randn(W, VIS['intermediate_size']) * 0.05
        t[lb + 'mlp.fc2.bias'] = rng.randn(W) * 0.01
    return t


@pytest.fixture(scope='module')
def cog_dir(tmp_path_factory):
    from safetensors.numpy import save_file

    from conftest import make_tiny_tokenizer

    rng = np.random.RandomState(29)
    lm = _tensors(rng)
    vt = _vis_tensors(rng)
    path = tmp_path_factory.mktemp('cogvlm')
    allt = {k: np.ascontiguousarray(np.asarray(v, np.float32))
            for k, v in {**lm, **vt}.items()}
    save_file(allt, str(path / 'model.safetensors'))
    with open(path / 'config.json', 'w') as f:
        json.dump(COG_CFG, f)
    make_tiny_tokenizer(str(path), vocab_size=128)

    # llama twin carrying the LANGUAGE expert weights
    twin = tmp_path_factory.mktemp('cog_twin')
    qo, ko = NH * HD, NKV * HD
    tw = {k: v for k, v in lm.items()
          if 'expert' not in k and 'mlp.' not in k}
    for l in range(L):
        p = f'model.layers.{l}.'
        qkv = lm[p + 'self_attn.language_expert_query_key_value.weight']
        tw[p + 'self_attn.q_proj.weight'] = qkv[:qo]
        tw[p + 'self_attn.k_proj.weight'] = qkv[qo:qo + ko]
        tw[p + 'self_attn.v_proj.weight'] = qkv[qo + ko:]
        tw[p + 'self_attn.o_proj.weight'] = \
            lm[p + 'self_attn.language_expert_dense.weight']
        tw[p + 'mlp.gate_proj.weight'] = \
            lm[p + 'mlp.language_mlp.gate_proj.weight']
        tw[p + 'mlp.up_proj.weight'] = lm[p + 'mlp.language_mlp.up_proj.weight']
        tw[p + 'mlp.down_proj.weight'] = \
            lm[p + 'mlp.language_mlp.down_proj.weight']
    with open(twin / 'config.json', 'w') as f:
        json.dump(LLAMA_CFG, f)
    save_file({k: np.ascontiguousarray(np.asarray(v, np.float32))
               for k, v in tw.items()}, str(twin / 'model.safetensors'))
    make_tiny_tokenizer(str(twin), vocab_size=128)
    return str(path), str(twin)


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
            71, prompt, GenerationConfig(max_new_tokens=n, ignore_eos=True),
            mm_data=mm_data)
        await inst.async_end(71)
        return list(out.token_ids)

    loop = asyncio.new_event_loop()
    try:
        return loop.run_until_complete(run())
    finally:
        loop.close()
        eng.close()


def test_text_path_matches_llama_twin(cog_dir):
    """With no image, only the language experts run — greedy tokens must
    equal a plain llama carrying those weights."""
    path, twin = cog_dir
    rng = np.random.RandomState(2)
    prompt = rng.randint(3, 120, size=10).tolist()
    assert _greedy(path, prompt, 8) == _greedy(twin, prompt, 8)


def test_dual_expert_routing_matters(cog_dir):
    """Image positions run the vision experts: zeroing them (via a copy of
    the checkpoint) must change the continuation."""
    from PIL import Image
    path, _ = cog_dir
    rng = np.random.RandomState(4)
    img = Image.fromarray(rng.randint(0, 255, (60, 60, 3), np.uint8))
    prompt = [5, 9, IMG_TOKEN, 17, 21]
    out1 = _greedy(path, prompt, 6, mm_data=[img])
    assert len(out1) == 6 and out1 == _greedy(path, prompt, 6, mm_data=[img])

    # copy with perturbed vision-expert weights
    import shutil
    import tempfile

    from safetensors.numpy import load_file, save_file
    tmp = tempfile.mkdtemp(prefix='cogvlm_zero')
    for f in os.listdir(path):
        shutil.copy(os.path.join(path, f), tmp)
    sd = load_file(os.path.join(tmp, 'model.safetensors'))
    for k in list(sd):
        if 'vision_expert' in k or 'vision_mlp' in k:
            sd[k] = sd[k] * 0.0
    save_file(sd, os.path.join(tmp, 'model.safetensors'))
    out2 = _greedy(tmp, prompt, 6, mm_data=[img])
    assert out2 != out1
    # and the text-only path is unaffected by the vision experts
    tprompt = [5, 9, 11, 17, 21]
    assert _greedy(tmp, tprompt, 6) == _greedy(path, tprompt, 6)


def test_tower_matches_torch_twin(cog_dir):
    import torch
    from safetensors.numpy import load_file

    from lmdeploy_tpu.config import ModelConfig
    from lmdeploy_tpu.models import build_model
    from lmdeploy_tpu.weight_loader import load_vis_params_np

    path, _ = cog_dir
    cfg = ModelConfig.from_pretrained(path, dtype='float32')
    model = build_model(cfg)
    vis = load_vis_params_np(model, path)
    rng = np.random.RandomState(6)
    pix = rng.rand(1, VIS['image_size'], VIS['image_size'], 3).astype(
        np.float32) * 2 - 1
    import jax.numpy as jnp
    got = np.asarray(model._tower_forward(
        __import__('jax').tree_util.tree_map(jnp.asarray, vis),
        jnp.asarray(pix)))[0]

    sd = load_file(os.path.join(path, 'model.safetensors'))
    b = 'model.vision.'
    W, P = VIS['hidden_size'], VIS['patch_size']
    heads = VIS['num_heads']
    hd = W // heads
    with torch.no_grad():
        x = torch.tensor(pix).permute(0, 3, 1, 2)
        x = torch.nn.functional.conv2d(
            x, torch.tensor(sd[b + 'patch_embedding.proj.weight']),
            torch.tensor(sd[b + 'patch_embedding.proj.bias']), stride=P)
        x = x.flatten(2).transpose(1, 2)
        cls = torch.tensor(sd[b + 'patch_embedding.cls_embedding'])
        x = torch.cat([cls.expand(1, 1, W), x], dim=1)
        x = x + torch.tensor(
            sd[b + 'patch_embedding.position_embedding.weight'])[None]

        def ln(v, wk, bk, eps=1e-6):
            return torch.nn.functional.layer_norm(
                v, (v.shape[-1],), torch.tensor(sd[wk]), torch.tensor(sd[bk]),
                eps=eps)

        S = x.shape[1]
        for li in range(VIS['num_hidden_layers']):
            lb = b + f'transformer.layers.{li}.'
            qkv = x @ torch.tensor(sd[lb + 'attention.query_key_value.weight']).T \
                + torch.tensor(sd[lb + 'attention.query_key_value.bias'])
            q, k, v = qkv.chunk(3, -1)

            def sp(t):
                return t.reshape(1, S, heads, hd).permute(0, 2, 1, 3)

            a = (sp(q) @ sp(k).transpose(-1, -2)) / math.sqrt(hd)
            o = (a.softmax(-1) @ sp(v)).permute(0, 2, 1, 3).reshape(1, S, W)
            o = o @ torch.tensor(sd[lb + 'attention.dense.weight']).T \
                + torch.tensor(sd[lb + 'attention.dense.bias'])
            x = x + ln(o, lb + 'input_layernorm.weight',
                       lb + 'input_layernorm.bias')
            y = torch.nn.functional.gelu(
                x @ torch.tensor(sd[lb + 'mlp.fc1.weight']).T
                + torch.tensor(sd[lb + 'mlp.fc1.bias']))
            y = y @ torch.tensor(sd[lb + 'mlp.fc2.weight']).T \
                + torch.tensor(sd[lb + 'mlp.fc2.bias'])
            x = x + ln(y, lb + 'post_attention_layernorm.weight',
                       lb + 'post_attention_layernorm.bias')
        x = x[:, 1:]
        g = int(math.isqrt(x.shape[1]))
        xi = x.reshape(1, g, g, W).permute(0, 3, 1, 2)
        xi = torch.nn.functional.conv2d(
            xi, torch.tensor(sd[b + 'conv.weight']),
            torch.tensor(sd[b + 'conv.bias']), stride=2)
        x = xi.flatten(2).transpose(1, 2)
        x = x @ torch.tensor(sd[b + 'linear_proj.linear_proj.weight']).T
        x = torch.nn.functional.gelu(
            ln(x, b + 'linear_proj.norm1.weight', b + 'linear_proj.norm1.bias',
               eps=1e-5))
        x = torch.nn.functional.silu(
            x @ torch.tensor(sd[b + 'linear_proj.gate_proj.weight']).T) \
            * (x @ torch.tensor(sd[b + 'linear_proj.dense_h_to_4h.weight']).T)
        x = x @ torch.tensor(sd[b + 'linear_proj.dense_4h_to_h.weight']).T
        want = torch.cat([torch.tensor(sd[b + 'boi']).reshape(1, 1, H),
                          x, torch.tensor(sd[b + 'eoi']).reshape(1, 1, H)],
                         dim=1)[0].numpy()
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)
