"""Offline quantization (lite) end-to-end: calibrate -> quantize -> serve."""
import json
import os

import numpy as np
import pytest


def test_awq_format_roundtrip():
    from lmdeploy_tpu.lite.formats import (pack_awq_qweight, unpack_awq_qweight,
                                           unpack_gptq_qweight)
    rng = np.random.RandomState(0)
    q = rng.randint(0, 16, (64, 32)).astype(np.uint8)
    packed = pack_awq_qweight(q)
    assert packed.shape == (64, 4) and packed.dtype == np.int32
    np.testing.assert_array_equal(unpack_awq_qweight(packed), q)


@pytest.fixture(scope='module')
def awq_dir(tiny_model_dir, tmp_path_factory):
    from lmdeploy_tpu.lite.auto_awq import auto_awq
    work = str(tmp_path_factory.mktemp('awq_out'))
    auto_awq(tiny_model_dir, work_dir=work, w_group_size=32, calib_samples=4,
             calib_seqlen=128)
    return work


def test_awq_checkpoint_layout(awq_dir):
    with open(os.path.join(awq_dir, 'config.json')) as f:
        cfg = json.load(f)
    assert cfg['quantization_config']['quant_method'] == 'awq'
    assert cfg['quantization_config']['group_size'] == 32
    from safetensors import safe_open
    with safe_open(os.path.join(awq_dir, 'model.safetensors'), framework='np') as f:
        names = set(f.keys())
        assert 'model.layers.0.self_attn.q_proj.qweight' in names
        assert 'model.layers.0.self_attn.q_proj.qzeros' in names
        assert 'model.layers.0.self_attn.q_proj.scales' in names
        assert 'model.layers.0.self_attn.q_proj.weight' not in names
        qw = f.get_tensor('model.layers.0.self_attn.q_proj.qweight')
        assert qw.dtype == np.int32


def test_awq_model_serves_and_tracks_dense(awq_dir, tiny_model_dir):
    """The quantized model must load, generate, and stay close to the dense model."""
    from lmdeploy_tpu.engine.engine import Engine
    from lmdeploy_tpu.messages import GenerationConfig, TpuEngineConfig
    import asyncio

    def gen(model_dir, prompt, n):
        cfg = TpuEngineConfig(dtype='float32', block_size=16, num_gpu_blocks=32,
                              max_batch_size=4, session_len=128,
                              max_prefill_token_num=64)
        eng = Engine.from_pretrained(model_dir, cfg)

        async def run():
            inst = eng.create_instance()
            out = await inst.async_infer(
                1, prompt, GenerationConfig(max_new_tokens=n, ignore_eos=True))
            await inst.async_end(1)
            return out.token_ids

        loop = asyncio.new_event_loop()
        try:
            ids = loop.run_until_complete(run())
        finally:
            eng.close()
            loop.close()
        return ids

    prompt = [1, 17, 42, 99, 7, 23]
    dense = gen(tiny_model_dir, prompt, 4)
    quant = gen(awq_dir, prompt, 4)
    assert len(quant) == 4
    # random tiny weights quantize noisily; require the continuation to at least
    # start identically (first greedy token survives 4-bit on this checkpoint)
    assert quant[0] == dense[0]


def test_smooth_quant_roundtrip(tiny_model_dir, tmp_path_factory):
    from lmdeploy_tpu.lite.smooth_quant import smooth_quant
    work = str(tmp_path_factory.mktemp('sq_out'))
    smooth_quant(tiny_model_dir, work_dir=work, calib_samples=2, calib_seqlen=64)
    with open(os.path.join(work, 'config.json')) as f:
        cfg = json.load(f)
    assert cfg['quantization_config']['quant_method'] == 'smooth_quant'

    from lmdeploy_tpu.config import ModelConfig
    from lmdeploy_tpu.models import build_model
    from lmdeploy_tpu.weight_loader import load_params_np
    mc = ModelConfig.from_pretrained(work, dtype='float32')
    model = build_model(mc)
    assert model.quant_method == 'w8a8'
    params = load_params_np(model, work)
    assert params['layers']['wq']['w8'].dtype == np.int8
    assert params['layers']['wq']['w8'].any()
