"""Qwen2-VL: tower + mrope parity vs the HF reference implementation, and
engine e2e (reference analog: lmdeploy/pytorch/models/qwen2_vl.py)."""
import json

import numpy as np
import pytest

import jax.numpy as jnp


def _tiny_hf_qwen2vl(tmp_path):
    """Tiny random-weight HF Qwen2VLForConditionalGeneration checkpoint."""
    import torch
    from transformers import Qwen2VLConfig, Qwen2VLForConditionalGeneration

    torch.manual_seed(0)
    cfg = Qwen2VLConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, rope_theta=10000.0,
        rms_norm_eps=1e-6, tie_word_embeddings=False,
        bos_token_id=1, eos_token_id=2,
        image_token_id=151, video_token_id=152,
        vision_start_token_id=153, vision_end_token_id=154,
        rope_scaling={'type': 'mrope', 'mrope_section': [2, 3, 3]},
        vision_config=dict(depth=2, embed_dim=32, num_heads=4, in_channels=3,
                           patch_size=14, spatial_merge_size=2,
                           temporal_patch_size=2, mlp_ratio=4,
                           hidden_size=64),
    )
    model = Qwen2VLForConditionalGeneration(cfg).eval().float()
    path = tmp_path / 'tiny_qwen2vl'
    model.save_pretrained(str(path), safe_serialization=True)
    return model, cfg, str(path)


@pytest.fixture(scope='module')
def hf_and_dir(tmp_path_factory):
    return _tiny_hf_qwen2vl(tmp_path_factory.mktemp('qwen2vl'))


def _pixels_and_grid(rng, gh=4, gw=4):
    """Raw 14*gh x 14*gw image -> (my patch rows, HF pixel_values, grid)."""
    from lmdeploy_tpu.vl.qwen_vl import QwenVLImageProcessor

    img = (rng.rand(gh * 14, gw * 14, 3) * 255).astype(np.uint8)
    proc = QwenVLImageProcessor()
    pixels, grid = proc(img)
    assert grid == (1, gh, gw)
    return img, pixels, grid


def test_tower_matches_hf(hf_and_dir):
    """My mask-based tower == HF Qwen2VisionTransformer on the same patches."""
    import torch

    hf_model, cfg, path = hf_and_dir
    from lmdeploy_tpu.config import ModelConfig
    from lmdeploy_tpu.models import build_model
    from lmdeploy_tpu.models.qwen2_vl import patch_metadata
    from lmdeploy_tpu.weight_loader import load_vis_params_np

    with open(path + '/config.json') as f:
        mc = ModelConfig.from_hf_config(json.load(f), dtype='float32')
    model = build_model(mc)
    vis_np = load_vis_params_np(model, path)

    rng = np.random.RandomState(3)
    img, pixels, grid = _pixels_and_grid(rng)

    visual = hf_model.visual if hasattr(hf_model, 'visual') \
        else hf_model.model.visual
    with torch.no_grad():
        want = visual(torch.tensor(pixels),
                      grid_thw=torch.tensor([list(grid)])).numpy()

    md = patch_metadata(grid, 2, model.tower.win_tokens)
    got = np.asarray(model.tower.forward(
        vis_np, jnp.asarray(pixels), jnp.asarray(md['hpos']),
        jnp.asarray(md['wpos']), jnp.asarray(md['frame']),
        jnp.asarray(md['win'])))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_mrope_positions_match_hf(hf_and_dir):
    """mrope_positions == HF get_rope_index for text+image prompts."""
    import torch

    hf_model, cfg, path = hf_and_dir
    from lmdeploy_tpu.models.qwen2_vl import mrope_positions

    grid = (1, 4, 6)
    n_img = (grid[1] // 2) * (grid[2] // 2)
    ids = [5, 6, 153] + [151] * n_img + [154, 7, 8, 9]
    mdl = hf_model.model if hasattr(hf_model.model, 'get_rope_index') \
        else hf_model
    want, delta = mdl.get_rope_index(
        torch.tensor([ids]), image_grid_thw=torch.tensor([list(grid)]))
    want = want[:, 0].T.numpy()                      # [n, 3]
    got, nxt = mrope_positions(ids, 151, [grid])
    np.testing.assert_array_equal(got, want)
    # decode delta: next rope position for token index len(ids)
    assert nxt == int(want.max()) + 1
    assert nxt - len(ids) == int(delta[0])


def test_engine_e2e_matches_hf_generate(hf_and_dir):
    """Greedy engine decode with an image == HF generate (token-identical)."""
    import asyncio

    import torch

    hf_model, cfg, path = hf_and_dir
    import sys
    sys.path.insert(0, 'tests')
    from conftest import make_tiny_tokenizer

    from lmdeploy_tpu.engine.engine import Engine
    from lmdeploy_tpu.messages import GenerationConfig, TpuEngineConfig
    from lmdeploy_tpu.models.qwen2_vl import patch_metadata  # noqa: F401

    make_tiny_tokenizer(path)
    rng = np.random.RandomState(7)
    img, pixels, grid = _pixels_and_grid(rng)
    n_img = (grid[1] // 2) * (grid[2] // 2)

    prompt = [5, 6, 153, 151, 154, 7, 8, 9]          # single placeholder
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
