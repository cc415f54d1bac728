"""InternVL3 native-transformers format (InternVLForConditionalGeneration):
tower+projector parity and engine e2e vs transformers (reference analog:
lmdeploy/pytorch/models/internvl3_hf.py)."""
import json

import numpy as np
import pytest

import jax.numpy as jnp


def _tiny_hf_internvl(tmp_path):
    import torch
    from transformers import InternVLConfig, InternVLForConditionalGeneration

    torch.manual_seed(9)
    cfg = InternVLConfig(
        text_config=dict(
            model_type='qwen2', vocab_size=256, hidden_size=48,
            intermediate_size=96, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=512, rope_theta=10000.0,
            rms_norm_eps=1e-6, tie_word_embeddings=False,
            bos_token_id=1, eos_token_id=2,
            architectures=['Qwen2ForCausalLM']),
        vision_config=dict(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, image_size=28, patch_size=14,
            layer_norm_eps=1e-6, norm_type='layer_norm',
            use_qk_norm=False, hidden_act='gelu'),
        image_token_id=151, downsample_ratio=0.5,
        vision_feature_layer=-1,
        vision_feature_select_strategy='default',
        projector_hidden_act='gelu',
    )
    model = InternVLForConditionalGeneration(cfg).eval().float()
    path = tmp_path / 'tiny_internvl3'
    model.save_pretrained(str(path), safe_serialization=True)
    return model, cfg, str(path)


@pytest.fixture(scope='module')
def hf_and_dir(tmp_path_factory):
    return _tiny_hf_internvl(tmp_path_factory.mktemp('internvl3'))


def test_features_match_hf(hf_and_dir):
    import torch

    hf_model, cfg, path = hf_and_dir
    from lmdeploy_tpu.config import ModelConfig
    from lmdeploy_tpu.models import build_model
    from lmdeploy_tpu.weight_loader import load_vis_params_np

    with open(path + '/config.json') as f:
        mc = ModelConfig.from_hf_config(json.load(f), dtype='float32')
    model = build_model(mc)
    vis_np = load_vis_params_np(model, path)

    rng = np.random.RandomState(4)
    pixels = rng.randn(1, 28, 28, 3).astype(np.float32)

    with torch.no_grad():
        want = hf_model.model.get_image_features(
            torch.tensor(pixels.transpose(0, 3, 1, 2)),
            vision_feature_layer=-1,
            vision_feature_select_strategy='default').numpy()
    got = np.asarray(model.encode_images(vis_np, jnp.asarray(pixels)))
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_engine_e2e_matches_hf_generate(hf_and_dir):
    import asyncio

    import torch

    hf_model, cfg, path = hf_and_dir
    import sys
    sys.path.insert(0, 'tests')
    from conftest import make_tiny_tokenizer

    from lmdeploy_tpu.engine.engine import Engine
    from lmdeploy_tpu.messages import GenerationConfig, TpuEngineConfig
    from lmdeploy_tpu.models.internvl import IMAGENET_MEAN, IMAGENET_STD

    make_tiny_tokenizer(path)
    rng = np.random.RandomState(7)
    img = (rng.rand(28, 28, 3) * 255).astype(np.uint8)
    pixels = ((np.asarray(img, np.float32) / 255.0
               - np.asarray(IMAGENET_MEAN, np.float32))
              / np.asarray(IMAGENET_STD, np.float32))
    pixels_pt = torch.tensor(pixels.transpose(2, 0, 1)[None])

    prompt = [5, 6, 153, 151, 154, 7, 8, 9]          # 1 image token
    with torch.no_grad():
        out = hf_model.generate(
            input_ids=torch.tensor([prompt]),
            pixel_values=pixels_pt,
            max_new_tokens=8, do_sample=False,
            eos_token_id=None, use_cache=True)
    want = out[0, len(prompt):].tolist()

    eng = Engine.from_pretrained(
        path, TpuEngineConfig(dtype='float32', block_size=16,
                              num_gpu_blocks=64, max_batch_size=4,
                              session_len=256, max_prefill_token_num=64))
    try:
        async def run():
            inst = eng.create_instance()
            out = await inst.async_infer(
                1, prompt, GenerationConfig(max_new_tokens=8, ignore_eos=True),
                mm_data=[img])
            await inst.async_end(1)
            return list(out.token_ids)

        loop = asyncio.new_event_loop()
        try:
            got = loop.run_until_complete(run())
        finally:
            loop.close()
        assert got == want, (got, want)
    finally:
        eng.close()
