"""DeepSeek-VL2: timm-SigLIP tower + downsample projector + DeepSeek-V2 LM.

Reference: lmdeploy/pytorch/models/deepseek_vl2.py.  Goldens: LM path vs a
plain DeepSeek-V2 twin; tower+projector+tile-layout vs a torch twin built
from torch primitives (timm ViT block semantics: pre-norm, fused qkv, exact
GELU); e2e tile counting + placeholder injection.
"""
import asyncio
import json
import math
import os

import numpy as np
import pytest

from test_deepseek import DS_CFG

VIS = {
    'hidden_size': 32, 'num_hidden_layers': 2, 'num_attention_heads': 2,
    'intermediate_size': 48, 'patch_size': 14, 'image_size': 56,
    'hidden_act': 'gelu', 'layer_norm_eps': 1e-6,
}
N_EMBED = DS_CFG['hidden_size']
PROJ = {'projector_type': 'downsample_mlp_gelu', 'input_dim': 32,
        'n_embed': N_EMBED, 'depth': 2, 'mlp_ratio': 1,
        'downsample_ratio': 2, 'token_pooling': False}
CANDIDATES = [[56, 56], [112, 56], [56, 112], [112, 112]]


def _ds_tensors(rng):
    c = DS_CFG
    H, V = c['hidden_size'], c['vocab_size']
    nh, dn, dr, dv, r = (c['num_attention_heads'], c['qk_nope_head_dim'],
                         c['qk_rope_head_dim'], c['v_head_dim'],
                         c['kv_lora_rank'])
    t = {
        'model.embed_tokens.weight': rng.randn(V, H) * 0.02,
        'model.norm.weight': np.ones(H),
        'lm_head.weight': rng.randn(V, H) * 0.02,
    }
    for l in range(c['num_hidden_layers']):
        p = f'model.layers.{l}.'
        t[p + 'input_layernorm.weight'] = np.ones(H)
        t[p + 'post_attention_layernorm.weight'] = np.ones(H)
        t[p + 'self_attn.q_proj.weight'] = rng.randn(nh * (dn + dr), H) * 0.05
        t[p + 'self_attn.kv_a_proj_with_mqa.weight'] = \
            rng.randn(r + dr, H) * 0.05
        t[p + 'self_attn.kv_a_layernorm.weight'] = np.ones(r)
        t[p + 'self_attn.kv_b_proj.weight'] = rng.randn(nh * (dn + dv), r) * 0.05
        t[p + 'self_attn.o_proj.weight'] = rng.randn(H, nh * dv) * 0.05
        if l < c['first_k_dense_replace']:
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
    return t


@pytest.fixture(scope='module')
def vl2_dir(tmp_path_factory):
    from safetensors.numpy import save_file

    from conftest import make_tiny_tokenizer

    path = tmp_path_factory.mktemp('dsvl2')
    rng = np.random.RandomState(21)
    lm = _ds_tensors(rng)
    tensors = {'language.' + k: v for k, v in lm.items()}

    W = VIS['hidden_size']
    P = VIS['patch_size']
    G = VIS['image_size'] // P
    tensors['vision.patch_embed.proj.weight'] = rng.randn(W, 3, P, P) * 0.05
    tensors['vision.patch_embed.proj.bias'] = rng.randn(W) * 0.01
    tensors['vision.pos_embed'] = rng.randn(1, G * G, W) * 0.02
    tensors['vision.norm.weight'] = np.ones(W) + rng.randn(W) * 0.01
    tensors['vision.norm.bias'] = rng.randn(W) * 0.01
    for li in range(VIS['num_hidden_layers']):
        b = f'vision.blocks.{li}.'
        tensors[b + 'norm1.weight'] = np.ones(W) + rng.randn(W) * 0.01
        tensors[b + 'norm1.bias'] = rng.randn(W) * 0.01
        tensors[b + 'norm2.weight'] = np.ones(W) + rng.randn(W) * 0.01
        tensors[b + 'norm2.bias'] = rng.randn(W) * 0.01
        tensors[b + 'attn.qkv.weight'] = rng.randn(3 * W, W) * 0.05
        tensors[b + 'attn.qkv.bias'] = rng.randn(3 * W) * 0.01
        tensors[b + 'attn.proj.weight'] = rng.randn(W, W) * 0.05
        tensors[b + 'attn.proj.bias'] = rng.randn(W) * 0.01
        tensors[b + 'mlp.fc1.weight'] = rng.randn(VIS['intermediate_size'], W) * 0.05
        tensors[b + 'mlp.fc1.bias'] = rng.randn(VIS['intermediate_size']) * 0.01
        tensors[b + 'mlp.fc2.weight'] = rng.randn(W, VIS['intermediate_size']) * 0.05
        tensors[b + 'mlp.fc2.bias'] = rng.randn(W) * 0.01
    tensors['projector.layers.0.weight'] = rng.randn(N_EMBED, 4 * W) * 0.05
    tensors['projector.layers.0.bias'] = rng.randn(N_EMBED) * 0.01
    tensors['projector.layers.2.weight'] = rng.randn(N_EMBED, N_EMBED) * 0.05
    tensors['projector.layers.2.bias'] = rng.randn(N_EMBED) * 0.01
    tensors['image_newline'] = rng.randn(N_EMBED) * 0.1
    tensors['view_seperator'] = rng.randn(N_EMBED) * 0.1
    tensors = {k: np.ascontiguousarray(np.asarray(v, np.float32))
               for k, v in tensors.items()}
    save_file(tensors, str(path / 'model.safetensors'))

    cfg = {
        'architectures': ['DeepseekVLV2ForCausalLM'],
        'model_type': 'deepseek_vl_v2',
        'language_config': {k: v for k, v in DS_CFG.items()
                            if k != 'architectures'},
        'vision_config': VIS,
        'projector_config': PROJ,
        'tile_tag': '2D', 'global_view_pos': 'head',
        'candidate_resolutions': CANDIDATES,
        'image_token_id': 127,
        'torch_dtype': 'float32',
    }
    with open(path / 'config.json', 'w') as f:
        json.dump(cfg, f)
    make_tiny_tokenizer(str(path), vocab_size=128)

    twin = tmp_path_factory.mktemp('dsvl2_lm_twin')
    with open(twin / 'config.json', 'w') as f:
        json.dump(DS_CFG, f)
    save_file({k: np.ascontiguousarray(np.asarray(v, np.float32))
               for k, v in lm.items()}, str(twin / 'model.safetensors'))
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
            61, prompt, GenerationConfig(max_new_tokens=n, ignore_eos=True),
            mm_data=mm_data)
        await inst.async_end(61)
        return list(out.token_ids)

    loop = asyncio.new_event_loop()
    try:
        return loop.run_until_complete(run())
    finally:
        loop.close()
        eng.close()


def test_lm_path_matches_deepseek_twin(vl2_dir):
    path, twin = vl2_dir
    rng = np.random.RandomState(2)
    prompt = rng.randint(3, 120, size=10).tolist()
    assert _greedy(path, prompt, 8) == _greedy(twin, prompt, 8)


def test_vision_path_matches_torch_twin(vl2_dir):
    import torch
    from PIL import Image
    from safetensors.numpy import load_file

    from lmdeploy_tpu.config import ModelConfig
    from lmdeploy_tpu.models import build_model
    from lmdeploy_tpu.models.deepseek_vl2 import tile_views
    from lmdeploy_tpu.weight_loader import load_vis_params_np

    path, _ = vl2_dir
    cfg = ModelConfig.from_pretrained(path, dtype='float32')
    model = build_model(cfg)
    vis = load_vis_params_np(model, path)

    rng = np.random.RandomState(3)
    img = Image.fromarray(rng.randint(0, 255, (80, 150, 3), np.uint8))
    feats, grids = model.encode_images_raw(
        __import__('jax').tree_util.tree_map(lambda x: x, vis), [img])
    (_, tw, th) = grids[0]
    g = VIS['image_size'] // VIS['patch_size']
    h = w = g // 2
    want_tokens = h * (w + 1) + 1 + th * h * (tw * w + 1)
    assert feats[0].shape == (want_tokens, N_EMBED)

    # torch twin over the same views
    sd = load_file(os.path.join(path, 'model.safetensors'))
    views, (tw2, th2) = tile_views(img, [tuple(c) for c in CANDIDATES],
                                   VIS['image_size'])
    assert (tw2, th2) == (tw, th)
    W = VIS['hidden_size']
    P = VIS['patch_size']
    with torch.no_grad():
        x = torch.tensor(views).permute(0, 3, 1, 2)           # [N,3,S,S]
        patch = torch.nn.functional.conv2d(
            x, torch.tensor(sd['vision.patch_embed.proj.weight']),
            torch.tensor(sd['vision.patch_embed.proj.bias']), stride=P)
        N = patch.shape[0]
        hfeat = patch.flatten(2).transpose(1, 2)              # [N, g*g, W]
        hfeat = hfeat + torch.tensor(sd['vision.pos_embed'])

        def ln(v, wk, bk):
            return torch.nn.functional.layer_norm(
                v, (v.shape[-1],), torch.tensor(sd[wk]),
                torch.tensor(sd[bk]), eps=1e-6)

        heads = VIS['num_attention_heads']
        hd = W // heads
        for li in range(VIS['num_hidden_layers']):
            b = f'vision.blocks.{li}.'
            y = ln(hfeat, b + 'norm1.weight', b + 'norm1.bias')
            qkv = y @ torch.tensor(sd[b + 'attn.qkv.weight']).T \
                + torch.tensor(sd[b + 'attn.qkv.bias'])
            q, k, v = qkv.chunk(3, -1)

            def sp(t):
                return t.reshape(N, -1, heads, hd).permute(0, 2, 1, 3)

            att = (sp(q) @ sp(k).transpose(-1, -2)) / math.sqrt(hd)
            o = (att.softmax(-1) @ sp(v)).permute(0, 2, 1, 3).reshape(
                N, -1, W)
            hfeat = hfeat + o @ torch.tensor(
                sd[b + 'attn.proj.weight']).T + torch.tensor(
                sd[b + 'attn.proj.bias'])
            y = ln(hfeat, b + 'norm2.weight', b + 'norm2.bias')
            y = torch.nn.functional.gelu(
                y @ torch.tensor(sd[b + 'mlp.fc1.weight']).T
                + torch.tensor(sd[b + 'mlp.fc1.bias']))
            hfeat = hfeat + y @ torch.tensor(
                sd[b + 'mlp.fc2.weight']).T + torch.tensor(
                sd[b + 'mlp.fc2.bias'])
        hfeat = ln(hfeat, 'vision.norm.weight', 'vision.norm.bias')
        # projector: 2x2 unfold + mlp
        g2 = g
        xx = hfeat.reshape(N, g2, g2, W).permute(0, 3, 1, 2)
        un = torch.nn.functional.unfold(xx, kernel_size=2, stride=2)
        un = un.permute(0, 2, 1)                              # [N, hw/4, 4W]
        y = un @ torch.tensor(sd['projector.layers.0.weight']).T \
            + torch.tensor(sd['projector.layers.0.bias'])
        y = torch.nn.functional.gelu(y)
        emb = y @ torch.tensor(sd['projector.layers.2.weight']).T \
            + torch.tensor(sd['projector.layers.2.bias'])     # [N, hw, D]
        hh = g2 // 2
        nl = torch.tensor(sd['image_newline'])
        glb = emb[0].reshape(hh, hh, N_EMBED)
        glb = torch.cat([glb, nl.expand(hh, 1, N_EMBED)], 1).reshape(
            -1, N_EMBED)
        loc = emb[1:].reshape(th, tw, hh, hh, N_EMBED).permute(
            0, 2, 1, 3, 4).reshape(th * hh, tw * hh, N_EMBED)
        loc = torch.cat([loc, nl.expand(th * hh, 1, N_EMBED)], 1).reshape(
            -1, N_EMBED)
        sep = torch.tensor(sd['view_seperator'])[None]
        want = torch.cat([glb, sep, loc], 0).numpy()
    np.testing.assert_allclose(feats[0], want, rtol=3e-4, atol=3e-4)


def test_e2e_image_injection(vl2_dir):
    from PIL import Image
    path, _ = vl2_dir
    rng = np.random.RandomState(4)
    img = Image.fromarray(rng.randint(0, 255, (100, 100, 3), np.uint8))
    prompt = [5, 9, 127, 17, 21]
    out = _greedy(path, prompt, 6, mm_data=[img])
    assert len(out) == 6
    assert out == _greedy(path, prompt, 6, mm_data=[img])
