"""Qwen3-VL: deepstack tower + interleaved mrope parity vs transformers, and
engine e2e (reference analog: lmdeploy/pytorch/models/qwen3_vl.py)."""
import json

import numpy as np
import pytest

import jax.numpy as jnp


def _tiny_hf_qwen3vl(tmp_path):
    import torch
    from transformers import Qwen3VLConfig, Qwen3VLForConditionalGeneration

    torch.manual_seed(2)
    cfg = Qwen3VLConfig(
        text_config=dict(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=4, num_attention_heads=4,
            num_key_value_heads=2, head_dim=16,
            max_position_embeddings=512, rope_theta=10000.0,
            rms_norm_eps=1e-6, tie_word_embeddings=False,
            bos_token_id=1, eos_token_id=2,
            rope_scaling={'rope_type': 'default',
                          'mrope_section': [2, 3, 3],
                          'mrope_interleaved': True}),
        vision_config=dict(
            depth=4, hidden_size=32, intermediate_size=64, num_heads=4,
            in_channels=3, patch_size=14, spatial_merge_size=2,
            temporal_patch_size=2, out_hidden_size=64,
            num_position_embeddings=64,
            deepstack_visual_indexes=[0, 1, 2]),
        image_token_id=151, video_token_id=152,
        vision_start_token_id=153, vision_end_token_id=154,
    )
    model = Qwen3VLForConditionalGeneration(cfg).eval().float()
    path = tmp_path / 'tiny_qwen3vl'
    model.save_pretrained(str(path), safe_serialization=True)
    return model, cfg, str(path)


@pytest.fixture(scope='module')
def hf_and_dir(tmp_path_factory):
    return _tiny_hf_qwen3vl(tmp_path_factory.mktemp('qwen3vl'))


def _pixels_and_grid(rng, gh=4, gw=4):
    from lmdeploy_tpu.vl.qwen_vl import QwenVLImageProcessor

    img = (rng.rand(gh * 14, gw * 14, 3) * 255).astype(np.uint8)
    proc = QwenVLImageProcessor()
    pixels, grid = proc(img)
    assert grid == (1, gh, gw)
    return img, pixels, grid


def test_tower_matches_hf(hf_and_dir):
    """Tower (pos-embed interpolation + deepstack mergers) == HF visual."""
    import torch

    hf_model, cfg, path = hf_and_dir
    from lmdeploy_tpu.config import ModelConfig
    from lmdeploy_tpu.models import build_model
    from lmdeploy_tpu.models.qwen2_vl import patch_metadata
    from lmdeploy_tpu.models.qwen3_vl import pos_embed_corners
    from lmdeploy_tpu.weight_loader import load_vis_params_np

    with open(path + '/config.json') as f:
        mc = ModelConfig.from_hf_config(json.load(f), dtype='float32')
    model = build_model(mc)
    vis_np = load_vis_params_np(model, path)

    rng = np.random.RandomState(3)
    img, pixels, grid = _pixels_and_grid(rng)

    visual = hf_model.model.visual
    with torch.no_grad():
        want_main, want_ds = visual(torch.tensor(pixels),
                                    grid_thw=torch.tensor([list(grid)]))
    want = np.concatenate([want_main.numpy()]
                          + [d.numpy() for d in want_ds], axis=-1)

    md = patch_metadata(grid, 2, 0)
    pos_idx, pos_wt = pos_embed_corners(grid, 2, model.tower.side)
    got = np.asarray(model.tower.forward(
        vis_np, jnp.asarray(pixels), jnp.asarray(md['hpos']),
        jnp.asarray(md['wpos']), jnp.asarray(md['frame']),
        jnp.asarray(pos_idx), jnp.asarray(pos_wt)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_engine_e2e_matches_hf_generate(hf_and_dir):
    """Greedy engine decode with an image (deepstack injection + interleaved
    mrope) == HF generate, token-identical."""
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
