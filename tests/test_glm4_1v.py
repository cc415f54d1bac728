"""GLM-4.1V: GLM-4 text (sandwich norms, interleaved partial mrope) + ViT
tower (bicubic pos-embed resampling, conv downsample, SwiGLU merger) vs
transformers (reference analog: lmdeploy/pytorch/models/glm4_1v.py)."""
import json

import numpy as np
import pytest

import jax.numpy as jnp


def _tiny_hf_glm4v(tmp_path):
    import torch
    from transformers import Glm4vConfig, Glm4vForConditionalGeneration

    torch.manual_seed(5)
    cfg = Glm4vConfig(
        text_config=dict(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=4, num_attention_heads=4,
            num_key_value_heads=2, head_dim=16,
            max_position_embeddings=512, rope_theta=10000.0,
            rms_norm_eps=1e-6, tie_word_embeddings=False,
            partial_rotary_factor=0.5, attention_bias=True,
            bos_token_id=1, eos_token_id=2,
            rope_scaling={'rope_type': 'default',
                          'mrope_section': [2, 1, 1]}),
        vision_config=dict(
            depth=4, hidden_size=32, num_heads=4, in_channels=3,
            patch_size=14, spatial_merge_size=2, temporal_patch_size=2,
            out_hidden_size=64, intermediate_size=48, image_size=112,
            rms_norm_eps=1e-5, attention_bias=False, hidden_act='silu'),
        image_token_id=151, video_token_id=152,
        image_start_token_id=153, image_end_token_id=154,
        video_start_token_id=155, video_end_token_id=156,
    )
    model = Glm4vForConditionalGeneration(cfg).eval().float()
    path = tmp_path / 'tiny_glm4v'
    model.save_pretrained(str(path), safe_serialization=True)
    return model, cfg, str(path)


@pytest.fixture(scope='module')
def hf_and_dir(tmp_path_factory):
    return _tiny_hf_glm4v(tmp_path_factory.mktemp('glm4v'))


def _pixels_and_grid(rng, gh=4, gw=4):
    from lmdeploy_tpu.vl.qwen_vl import QwenVLImageProcessor
    from PIL import Image
    img = Image.fromarray(
        rng.randint(0, 255, size=(gh * 14, gw * 14, 3), dtype=np.uint8))
    proc = QwenVLImageProcessor()
    pixels, grid = proc(img)
    assert grid == (1, gh, gw)
    return img, pixels, grid


def test_tower_matches_hf(hf_and_dir):
    import torch

    hf_model, cfg, path = hf_and_dir
    rng = np.random.RandomState(3)
    img, pixels, grid = _pixels_and_grid(rng)

    with torch.no_grad():
        want = hf_model.model.visual(torch.tensor(pixels),
                                     grid_thw=torch.tensor([list(grid)]))
    want = want.numpy()

    from lmdeploy_tpu.config import ModelConfig
    from lmdeploy_tpu.models import build_model
    from lmdeploy_tpu.models.glm4_1v import adapted_pos_embed
    from lmdeploy_tpu.models.qwen2_vl import patch_metadata
    from lmdeploy_tpu.weight_loader import load_vis_params_np

    mc = ModelConfig.from_pretrained(path, dtype='float32')
    model = build_model(mc)
    vis_np = load_vis_params_np(model, path)
    md = patch_metadata(grid, 2, 0)
    pe = adapted_pos_embed(np.asarray(vis_np['pos_embed'], np.float32), grid,
                           md['hpos'], md['wpos'])
    got = np.asarray(model.tower.forward(
        vis_np, jnp.asarray(pixels), jnp.asarray(pe),
        jnp.asarray(md['hpos']), jnp.asarray(md['wpos']),
        jnp.asarray(md['frame'])))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_engine_e2e_matches_hf_generate(hf_and_dir):
    """Greedy engine decode with an image == HF generate, token-identical."""
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
    img, pixels, grid = _pixels_and_grid(rng)
    n_img = (grid[1] // 2) * (grid[2] // 2)

    prompt = [5, 6, 153, 151, 154, 7, 8, 9]
    hf_ids = [5, 6, 153] + [151] * n_img + [154, 7, 8, 9]
    with torch.no_grad():
        out = hf_model.generate(
            input_ids=torch.tensor([hf_ids]),
            pixel_values=torch.tensor(pixels),
            image_grid_thw=torch.tensor([list(grid)]),
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
