"""fp8-e4m3 weight-only quantization (fbgemm_fp8-style checkpoints)."""
import json

import numpy as np
import pytest

import jax.numpy as jnp


def test_linear_fp8_matches_manual_dequant():
    import ml_dtypes

    from lmdeploy_tpu.nn.linear import linear

    rng = np.random.RandomState(0)
    K, N = 64, 32
    w_full = rng.randn(K, N).astype(np.float32)
    scale = (np.abs(w_full).max(axis=0) / 448.0 + 1e-8).astype(np.float32)
    w8 = (w_full / scale[None, :]).astype(ml_dtypes.float8_e4m3fn)
    x = rng.randn(2, 5, K).astype(np.float32)

    got = linear(jnp.asarray(x),
                 {'w8': jnp.asarray(w8), 'scale': jnp.asarray(scale)})
    want = x.reshape(-1, K) @ w8.astype(np.float32) * scale[None, :]
    np.testing.assert_allclose(np.asarray(got).reshape(-1, N), want,
                               rtol=1e-4, atol=1e-4)
    # and close to the unquantized matmul
    full = x.reshape(-1, K) @ w_full
    cos = np.sum(want * full) / (np.linalg.norm(want) * np.linalg.norm(full))
    assert cos > 0.99


@pytest.fixture(scope='module')
def fp8_model_dir(tmp_path_factory):
    """Tiny llama checkpoint with fp8 weights + per-channel weight_scale."""
    import ml_dtypes
    from safetensors.numpy import save_file

    from conftest import TINY_CFG, make_tiny_tokenizer

    path = tmp_path_factory.mktemp('tiny_fp8')
    cfg = dict(TINY_CFG)
    cfg['quantization_config'] = {'quant_method': 'fbgemm_fp8'}
    with open(path / 'config.json', 'w') as f:
        json.dump(cfg, f)
    make_tiny_tokenizer(str(path))

    rng = np.random.RandomState(0)
    H, I, V = cfg['hidden_size'], cfg['intermediate_size'], cfg['vocab_size']
    nh, nkv, hd = (cfg['num_attention_heads'], cfg['num_key_value_heads'],
                   cfg['head_dim'])
    t = {
        'model.embed_tokens.weight': (rng.randn(V, H) * 0.02).astype(np.float32),
        'model.norm.weight': np.ones(H, np.float32),
        'lm_head.weight': (rng.randn(V, H) * 0.02).astype(np.float32),
    }

    def fp8_pair(prefix, out_dim, in_dim):
        w = (rng.randn(out_dim, in_dim) * 0.02).astype(np.float32)
        sc = (np.abs(w).max(axis=1) / 448.0 + 1e-8).astype(np.float32)
        t[prefix + '.weight'] = (w / sc[:, None]).astype(ml_dtypes.float8_e4m3fn)
        t[prefix + '.weight_scale'] = sc.reshape(out_dim, 1)

    for layer in range(cfg['num_hidden_layers']):
        p = f'model.layers.{layer}.'
        t[p + 'input_layernorm.weight'] = np.ones(H, np.float32)
        t[p + 'post_attention_layernorm.weight'] = np.ones(H, np.float32)
        fp8_pair(p + 'self_attn.q_proj', nh * hd, H)
        fp8_pair(p + 'self_attn.k_proj', nkv * hd, H)
        fp8_pair(p + 'self_attn.v_proj', nkv * hd, H)
        fp8_pair(p + 'self_attn.o_proj', H, nh * hd)
        fp8_pair(p + 'mlp.gate_proj', I, H)
        fp8_pair(p + 'mlp.up_proj', I, H)
        fp8_pair(p + 'mlp.down_proj', H, I)
    t = {k: np.ascontiguousarray(v) for k, v in t.items()}
    save_file(t, str(path / 'model.safetensors'))
    return str(path)


def test_fp8_engine_e2e(fp8_model_dir):
    """Engine loads the fp8 checkpoint, weights stay fp8 on device, greedy
    generation is deterministic."""
    import asyncio

    from lmdeploy_tpu.engine.engine import Engine
    from lmdeploy_tpu.messages import GenerationConfig, TpuEngineConfig

    eng = Engine.from_pretrained(
        fp8_model_dir,
        TpuEngineConfig(dtype='float32', block_size=16, num_gpu_blocks=64,
                        max_batch_size=4, session_len=256,
                        max_prefill_token_num=64))
    try:
        w = eng.model_agent.host_params()['layers']['wq']
        assert w['w8'].dtype == jnp.float8_e4m3fn
        assert float(jnp.abs(w['w8'].astype(jnp.float32)).max()) > 0

        def gen(sid):
            async def run():
                inst = eng.create_instance()
                out = await inst.async_infer(sid, [5, 17, 42, 99], GenerationConfig(
                    max_new_tokens=8, ignore_eos=True))
                await inst.async_end(sid)
                return list(out.token_ids)
            loop = asyncio.new_event_loop()
            try:
                return loop.run_until_complete(run())
            finally:
                loop.close()

        a, b = gen(1), gen(2)
        assert len(a) == 8 and a == b
    finally:
        eng.close()
