"""Gemma3-VL: SigLIP tower + projector parity vs transformers, and engine
e2e with bidirectional image-token attention (reference analog:
lmdeploy/pytorch/models/gemma3_vl.py)."""
import json

import numpy as np
import pytest

import jax.numpy as jnp


def _tiny_hf_gemma3vl(tmp_path):
    import torch
    from transformers import Gemma3Config, Gemma3ForConditionalGeneration

    torch.manual_seed(3)
    cfg = Gemma3Config(
        text_config=dict(
            vocab_size=256, hidden_size=48, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=16, query_pre_attn_scalar=16,
            max_position_embeddings=512, rope_theta=10000.0,
            rope_local_base_freq=10000.0, rms_norm_eps=1e-6,
            sliding_window=16, sliding_window_pattern=2,
            bos_token_id=1, eos_token_id=2, tie_word_embeddings=True),
        vision_config=dict(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, image_size=56, patch_size=14,
            num_channels=3, layer_norm_eps=1e-6,
            hidden_act='gelu_pytorch_tanh'),
        image_token_index=151, boi_token_index=153, eoi_token_index=154,
        mm_tokens_per_image=4,
    )
    model = Gemma3ForConditionalGeneration(cfg).eval().float()
    path = tmp_path / 'tiny_gemma3vl'
    model.save_pretrained(str(path), safe_serialization=True)
    return model, cfg, str(path)


@pytest.fixture(scope='module')
def hf_and_dir(tmp_path_factory):
    return _tiny_hf_gemma3vl(tmp_path_factory.mktemp('gemma3vl'))


def test_tower_and_projector_match_hf(hf_and_dir):
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
    pixels = rng.randn(1, 56, 56, 3).astype(np.float32)

    with torch.no_grad():
        want = hf_model.model.get_image_features(
            torch.tensor(pixels.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(model.encode_images(vis_np, jnp.asarray(pixels)))
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_engine_e2e_matches_hf_generate(hf_and_dir):
    """Greedy engine decode with an image (bidirectional image-token mask,
    gemma3 dual rope) == HF generate, token-identical."""
    import asyncio

    import torch

    hf_model, cfg, path = hf_and_dir
    import sys
    sys.path.insert(0, 'tests')
    from conftest import make_tiny_tokenizer

    from lmdeploy_tpu.engine.engine import Engine
    from lmdeploy_tpu.messages import GenerationConfig, TpuEngineConfig

    make_tiny_tokenizer(path)
    rng = np.random.RandomState(7)
    img = (rng.rand(56, 56, 3) * 255).astype(np.uint8)

    # our processor: square resize + 0.5 normalize — replicate for HF
    pixels = (np.asarray(img, np.float32) / 255.0 - 0.5) / 0.5
    pixels_pt = torch.tensor(pixels.transpose(2, 0, 1)[None])

    n_img = 4                                         # mm_tokens_per_image
    prompt = [5, 6, 153, 151, 154, 7, 8, 9]
    hf_ids = [5, 6, 153] + [151] * n_img + [154, 7, 8, 9]
    token_type_ids = torch.tensor(
        [[1 if t == 151 else 0 for t in hf_ids]])
    with torch.no_grad():
        out = hf_model.generate(
            input_ids=torch.tensor([hf_ids]),
            pixel_values=pixels_pt,
            token_type_ids=token_type_ids,
            max_new_tokens=8, do_sample=False,
            eos_token_id=None, use_cache=True)
    want = out[0, len(hf_ids):].tolist()

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
