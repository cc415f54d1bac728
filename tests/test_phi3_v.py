"""Phi-3-Vision: CLIP tower + HD transform + projector over the Phi-3 LM.

Reference: lmdeploy/pytorch/models/phi3_v.py.  Goldens: (a) the vision path
(CLIP layer -2 patch features, 2x2 merge, newline separators, sub|glb_GN|glb
order, GELU projector) matches a twin built from transformers' CLIPVisionModel
plus the documented HD math in torch; (b) the LM path matches a plain Phi-3
twin; (c) e2e image injection expands the placeholder to the token formula.
"""
import asyncio
import json
import os

import numpy as np
import pytest

H, I, V, NH, NKV, HD, L = 64, 96, 128, 4, 2, 16, 2
CLIP_TINY = {
    'hidden_size': 32, 'num_hidden_layers': 2, 'num_attention_heads': 2,
    'intermediate_size': 48, 'patch_size': 56, 'image_size': 336,
    'hidden_act': 'quick_gelu', 'layer_norm_eps': 1e-5,
    'num_channels': 3, 'projection_dim': 32,
}
NUM_CROPS = 4
LM_CFG = {
    'architectures': ['Phi3ForCausalLM'], 'model_type': 'phi3',
    'hidden_size': H, 'intermediate_size': I, 'num_hidden_layers': L,
    'num_attention_heads': NH, 'num_key_value_heads': NKV,
    'vocab_size': V, 'max_position_embeddings': 512,
    'rms_norm_eps': 1e-6, 'rope_theta': 10000.0, 'eos_token_id': 2,
    'tie_word_embeddings': False, 'torch_dtype': 'float32',
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
        t[p + 'self_attn.qkv_proj.weight'] = \
            rng.randn((NH + 2 * NKV) * HD, H) * 0.02
        t[p + 'self_attn.o_proj.weight'] = rng.randn(H, NH * HD) * 0.02
        t[p + 'mlp.gate_up_proj.weight'] = rng.randn(2 * I, H) * 0.02
        t[p + 'mlp.down_proj.weight'] = rng.randn(H, I) * 0.02
    return t


@pytest.fixture(scope='module')
def phi3v_dir(tmp_path_factory):
    import torch
    from safetensors.numpy import save_file
    from transformers import CLIPVisionConfig, CLIPVisionModel

    from conftest import make_tiny_tokenizer

    path = tmp_path_factory.mktemp('phi3v')
    rng = np.random.RandomState(13)
    tensors = dict(_lm_tensors(rng))

    torch.manual_seed(31)
    clip = CLIPVisionModel(CLIPVisionConfig(**CLIP_TINY)).float().eval()
    base = 'model.vision_embed_tokens.'
    for k, v in clip.state_dict().items():
        tensors[base + 'img_processor.' + k] = v.numpy()
    C4 = 4 * CLIP_TINY['hidden_size']
    tensors[base + 'glb_GN'] = rng.randn(1, 1, C4) * 0.02
    tensors[base + 'sub_GN'] = rng.randn(1, 1, 1, C4) * 0.02
    tensors[base + 'img_projection.0.weight'] = rng.randn(H, C4) * 0.02
    tensors[base + 'img_projection.0.bias'] = rng.randn(H) * 0.01
    tensors[base + 'img_projection.2.weight'] = rng.randn(H, H) * 0.02
    tensors[base + 'img_projection.2.bias'] = rng.randn(H) * 0.01
    tensors = {k: np.ascontiguousarray(np.asarray(v, np.float32))
               for k, v in tensors.items()}
    save_file(tensors, str(path / 'model.safetensors'))

    cfg = dict(LM_CFG)
    cfg['architectures'] = ['Phi3VForCausalLM']
    cfg['model_type'] = 'phi3_v'
    cfg['vision_config'] = CLIP_TINY
    cfg['img_processor'] = {
        'name': 'clip_vision_model',
        'model_name': 'openai/clip-vit-large-patch14-336',
        'image_dim_out': CLIP_TINY['hidden_size'],
        'num_img_tokens': 144, 'layer_idx': -2, 'num_crops': NUM_CROPS,
    }
    cfg['image_token_id'] = 126
    with open(path / 'config.json', 'w') as f:
        json.dump(cfg, f)
    make_tiny_tokenizer(str(path), vocab_size=128)

    twin_path = tmp_path_factory.mktemp('phi3_lm_twin')
    with open(twin_path / 'config.json', 'w') as f:
        json.dump(LM_CFG, f)
    save_file({k: np.ascontiguousarray(np.asarray(v, np.float32))
               for k, v in _lm_tensors(np.random.RandomState(13)).items()},
              str(twin_path / 'model.safetensors'))
    make_tiny_tokenizer(str(twin_path), vocab_size=128)
    return str(path), str(twin_path), clip


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
            41, prompt, GenerationConfig(max_new_tokens=n, ignore_eos=True),
            mm_data=mm_data)
        await inst.async_end(41)
        return list(out.token_ids)

    loop = asyncio.new_event_loop()
    try:
        return loop.run_until_complete(run())
    finally:
        loop.close()
        eng.close()


def test_lm_path_matches_phi3_twin(phi3v_dir):
    path, twin_path, _ = phi3v_dir
    rng = np.random.RandomState(2)
    prompt = rng.randint(3, 120, size=10).tolist()
    assert _greedy(path, prompt, 8) == _greedy(twin_path, prompt, 8)


def _torch_hd_twin(clip, tensors, crops, h_crop, w_crop):
    """Reference HD math in torch from the same crops + weights."""
    import torch
    with torch.no_grad():
        pix = torch.tensor(crops).permute(0, 3, 1, 2)     # [N, 3, S, S]
        out = clip(pix, output_hidden_states=True)
        feats = out.hidden_states[-2][:, 1:]              # [N, T, C]
        C = feats.shape[-1]
        Hs = int(feats.shape[1] ** 0.5)
        m = Hs // 2

        def merge(x, hc, wc):
            N = x.shape[0]
            x = x.reshape(N, Hs, Hs, C).reshape(N, m, 2, m, 2, C)
            x = x.permute(0, 1, 3, 2, 4, 5).reshape(N, m, m, 4 * C)
            x = x.reshape(hc, wc, m, m, 4 * C).permute(0, 2, 1, 3, 4)
            return x.reshape(hc * m, wc * m, 4 * C)

        sub_GN = torch.tensor(tensors['sub_GN'])
        glb_GN = torch.tensor(tensors['glb_GN'])

        def newline(x):
            R = x.shape[0]
            nl = sub_GN[0].expand(R, 1, 4 * C)
            return torch.cat([x, nl], dim=1).reshape(-1, 4 * C)

        glb = merge(feats[:1], 1, 1)
        sub = merge(feats[1:1 + h_crop * w_crop], h_crop, w_crop)
        seq = torch.cat([newline(sub), glb_GN[0], newline(glb)], dim=0)
        w1 = torch.tensor(tensors['p1w'])
        b1 = torch.tensor(tensors['p1b'])
        w2 = torch.tensor(tensors['p2w'])
        b2 = torch.tensor(tensors['p2b'])
        y = torch.nn.functional.gelu(seq @ w1.T + b1)
        return (y @ w2.T + b2).numpy()


def test_vision_path_matches_torch_twin(phi3v_dir):
    from PIL import Image

    from lmdeploy_tpu.config import ModelConfig
    from lmdeploy_tpu.models import build_model
    from lmdeploy_tpu.models.phi3_v import hd_preprocess, num_image_tokens
    from lmdeploy_tpu.weight_loader import load_vis_params_np

    path, _, clip = phi3v_dir
    cfg = ModelConfig.from_pretrained(path, dtype='float32')
    model = build_model(cfg)
    vis_np = load_vis_params_np(model, path)
    import jax
    vis = jax.tree_util.tree_map(lambda x: x, vis_np)

    rng = np.random.RandomState(3)
    img = Image.fromarray(rng.randint(0, 255, (500, 700, 3), np.uint8))
    feats, grids = model.encode_images_raw(vis, [img])
    (_, h_crop, w_crop) = grids[0]
    merged = model.tower.grid // 2
    assert feats[0].shape == (num_image_tokens(h_crop, w_crop, merged), H)

    crops, (hc2, wc2) = hd_preprocess(img, NUM_CROPS)
    assert (hc2, wc2) == (h_crop, w_crop)
    from safetensors.numpy import load_file
    sd = load_file(os.path.join(path, 'model.safetensors'))
    base = 'model.vision_embed_tokens.'
    t = {'sub_GN': sd[base + 'sub_GN'], 'glb_GN': sd[base + 'glb_GN'],
         'p1w': sd[base + 'img_projection.0.weight'],
         'p1b': sd[base + 'img_projection.0.bias'],
         'p2w': sd[base + 'img_projection.2.weight'],
         'p2b': sd[base + 'img_projection.2.bias']}
    want = _torch_hd_twin(clip, t, crops, h_crop, w_crop)
    np.testing.assert_allclose(feats[0], want, rtol=2e-4, atol=2e-4)


def test_e2e_image_injection(phi3v_dir):
    from PIL import Image
    path, _, _ = phi3v_dir
    rng = np.random.RandomState(4)
    img = Image.fromarray(rng.randint(0, 255, (400, 400, 3), np.uint8))
    prompt = [5, 9, 126, 17, 21]
    out = _greedy(path, prompt, 6, mm_data=[img])
    assert len(out) == 6
    out2 = _greedy(path, prompt, 6, mm_data=[img])
    assert out == out2
