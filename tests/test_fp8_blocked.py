"""Blocked-scale fp8 (DeepSeek-V3 native 128x128 grids; reference
lmdeploy/pytorch/nn/linear/blocked_fp8.py)."""
import json

import numpy as np
import pytest

import jax.numpy as jnp


def _quantize_blocked(w, bn, bk):
    """HF layout [N, K] -> (w8 [N, K], scale_inv [ceil(N/bn), ceil(K/bk)])."""
    import ml_dtypes

    N, K = w.shape
    nb, kb = -(-N // bn), -(-K // bk)
    w8 = np.zeros_like(w)
    s = np.zeros((nb, kb), np.float32)
    for i in range(nb):
        for j in range(kb):
            blk = w[i * bn:(i + 1) * bn, j * bk:(j + 1) * bk]
            sc = np.abs(blk).max() / 448.0 + 1e-8
            s[i, j] = sc
            w8[i * bn:(i + 1) * bn, j * bk:(j + 1) * bk] = blk / sc
    return w8.astype(ml_dtypes.float8_e4m3fn), s


def test_linear_fp8_blocked_matches_manual_dequant():
    from lmdeploy_tpu.nn.linear import linear

    rng = np.random.RandomState(0)
    K, N, bn, bk = 96, 64, 32, 32
    w_full = rng.randn(N, K).astype(np.float32) * 0.05
    w8_hf, s_hf = _quantize_blocked(w_full, bn, bk)

    # framework layout: weight [K, N], scale grid [Kb, Nb]
    w8 = np.ascontiguousarray(w8_hf.T)
    bs = np.ascontiguousarray(s_hf.T)
    x = rng.randn(3, 7, K).astype(np.float32)

    got = linear(jnp.asarray(x),
                 {'w8': jnp.asarray(w8), 'bscale': jnp.asarray(bs)})

    s_full = np.repeat(np.repeat(s_hf, bn, axis=0)[:N], bk, axis=1)[:, :K]
    w_deq = w8_hf.astype(np.float32) * s_full
    want = x.reshape(-1, K) @ w_deq.T
    np.testing.assert_allclose(np.asarray(got).reshape(-1, N), want,
                               rtol=2e-2, atol=2e-2)
    full = x.reshape(-1, K) @ w_full.T
    cos = np.sum(want * full) / (np.linalg.norm(want) * np.linalg.norm(full))
    assert cos > 0.99


def test_linear_fp8_blocked_ragged_tail():
    """K/N not multiples of the block: tail blocks get their own scales."""
    from lmdeploy_tpu.nn.linear import linear

    rng = np.random.RandomState(1)
    K, N, bn, bk = 80, 48, 32, 32       # ragged: 80 = 2*32+16, 48 = 32+16
    w_full = rng.randn(N, K).astype(np.float32) * 0.05
    w8_hf, s_hf = _quantize_blocked(w_full, bn, bk)
    got = linear(jnp.asarray(rng.randn(4, K).astype(np.float32)),
                 {'w8': jnp.asarray(np.ascontiguousarray(w8_hf.T)),
                  'bscale': jnp.asarray(np.ascontiguousarray(s_hf.T))})
    assert np.asarray(got).shape == (4, N)
    assert np.isfinite(np.asarray(got)).all()


@pytest.fixture(scope='module')
def fp8_blocked_model_dir(tmp_path_factory):
    """Tiny llama checkpoint in DeepSeek-V3 native blocked-fp8 format."""
    from safetensors.numpy import save_file

    from conftest import TINY_CFG, make_tiny_tokenizer

    path = tmp_path_factory.mktemp('tiny_fp8_blocked')
    cfg = dict(TINY_CFG)
    cfg['quantization_config'] = {
        'quant_method': 'fp8', 'fmt': 'e4m3',
        'weight_block_size': [32, 32],
    }
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

    def blocked_pair(prefix, out_dim, in_dim):
        w = (rng.randn(out_dim, in_dim) * 0.02).astype(np.float32)
        w8, s = _quantize_blocked(w, 32, 32)
        t[prefix + '.weight'] = w8
        t[prefix + '.weight_scale_inv'] = s

    for layer in range(cfg['num_hidden_layers']):
        p = f'model.layers.{layer}.'
        t[p + 'input_layernorm.weight'] = np.ones(H, np.float32)
        t[p + 'post_attention_layernorm.weight'] = np.ones(H, np.float32)
        blocked_pair(p + 'self_attn.q_proj', nh * hd, H)
        blocked_pair(p + 'self_attn.k_proj', nkv * hd, H)
        blocked_pair(p + 'self_attn.v_proj', nkv * hd, H)
        blocked_pair(p + 'self_attn.o_proj', H, nh * hd)
        blocked_pair(p + 'mlp.gate_proj', I, H)
        blocked_pair(p + 'mlp.up_proj', I, H)
        blocked_pair(p + 'mlp.down_proj', H, I)
    t = {k: np.ascontiguousarray(v) for k, v in t.items()}
    save_file(t, str(path / 'model.safetensors'))
    return str(path)


def test_fp8_blocked_engine_e2e(fp8_blocked_model_dir):
    """Engine loads DeepSeek-V3-format blocked fp8; weights stay fp8 on
    device; greedy generation is deterministic."""
    import asyncio

    from lmdeploy_tpu.engine.engine import Engine
    from lmdeploy_tpu.messages import GenerationConfig, TpuEngineConfig

    eng = Engine.from_pretrained(
        fp8_blocked_model_dir,
        TpuEngineConfig(dtype='float32', block_size=16, num_gpu_blocks=64,
                        max_batch_size=4, session_len=256,
                        max_prefill_token_num=64))
    try:
        w = eng.model_agent.host_params()['layers']['wq']
        assert w['w8'].dtype == jnp.float8_e4m3fn
        assert 'bscale' in w and w['bscale'].ndim == 3
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
