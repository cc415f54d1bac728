"""MemDecode: auxiliary memory model fused with the base per step.

Reference analog: lmdeploy/pytorch/memdecode/ (agent.py lockstep memory
model, fusion.py lambda / RouterNetwork log-prob mixing).
"""
import asyncio
import json

import numpy as np
import pytest

import jax.numpy as jnp


@pytest.fixture(scope='module')
def mem_model_dir(tmp_path_factory):
    """A second tiny llama (different weights) to act as the memory model."""
    from conftest import TINY_CFG, make_tiny_tokenizer
    from safetensors.numpy import save_file

    path = tmp_path_factory.mktemp('tiny_memory')
    cfg = dict(TINY_CFG)
    with open(path / 'config.json', 'w') as f:
        json.dump(cfg, f)
    make_tiny_tokenizer(str(path))
    rng = np.random.RandomState(7)
    H, I, V = cfg['hidden_size'], cfg['intermediate_size'], cfg['vocab_size']
    nh, nkv, hd = (cfg['num_attention_heads'], cfg['num_key_value_heads'],
                   cfg['head_dim'])
    t = {'model.embed_tokens.weight': rng.randn(V, H) * 0.02,
         'model.norm.weight': np.ones(H),
         'lm_head.weight': rng.randn(V, H) * 0.02}
    for layer in range(cfg['num_hidden_layers']):
        p = f'model.layers.{layer}.'
        t.update({
            p + 'input_layernorm.weight': np.ones(H),
            p + 'post_attention_layernorm.weight': np.ones(H),
            p + 'self_attn.q_proj.weight': rng.randn(nh * hd, H) * 0.02,
            p + 'self_attn.k_proj.weight': rng.randn(nkv * hd, H) * 0.02,
            p + 'self_attn.v_proj.weight': rng.randn(nkv * hd, H) * 0.02,
            p + 'self_attn.o_proj.weight': rng.randn(H, nh * hd) * 0.02,
            p + 'mlp.gate_proj.weight': rng.randn(I, H) * 0.02,
            p + 'mlp.up_proj.weight': rng.randn(I, H) * 0.02,
            p + 'mlp.down_proj.weight': rng.randn(H, I) * 0.02,
        })
    t = {k: np.ascontiguousarray(v.astype(np.float32)) for k, v in t.items()}
    save_file(t, str(path / 'model.safetensors'))
    return str(path)


def _engine(model_dir, memdecode=None):
    from lmdeploy_tpu.engine.engine import Engine
    from lmdeploy_tpu.messages import TpuEngineConfig
    cfg = TpuEngineConfig(dtype='float32', block_size=16, num_gpu_blocks=64,
                          max_batch_size=4, session_len=128,
                          max_prefill_token_num=64, memdecode=memdecode)
    return Engine.from_pretrained(model_dir, cfg)


def _gen(eng, prompt, n=6):
    from lmdeploy_tpu.messages import GenerationConfig

    async def run():
        inst = eng.create_instance()
        out = await inst.async_infer(1, prompt,
                                     GenerationConfig(max_new_tokens=n,
                                                      ignore_eos=True))
        await inst.async_end(1)
        return list(out.token_ids)

    loop = asyncio.new_event_loop()
    try:
        return loop.run_until_complete(run())
    finally:
        loop.close()


def test_fuse_logits_math():
    """Fixed-lambda fusion: exact logaddexp of log-probs, base normalizer
    restored (reference fusion.py forward)."""
    from lmdeploy_tpu.engine.memdecode import fuse_logits
    rng = np.random.RandomState(0)
    b = jnp.asarray(rng.randn(3, 50).astype(np.float32) * 2)
    m = jnp.asarray(rng.randn(3, 50).astype(np.float32) * 2)
    lam = 0.3
    got = np.asarray(fuse_logits(b, m, 50, lambda_value=lam))

    bl = np.asarray(b, np.float64)
    ml = np.asarray(m, np.float64)
    blp = bl - np.log(np.exp(bl - bl.max(-1, keepdims=True)).sum(
        -1, keepdims=True)) - bl.max(-1, keepdims=True)
    mlp = ml - np.log(np.exp(ml - ml.max(-1, keepdims=True)).sum(
        -1, keepdims=True)) - ml.max(-1, keepdims=True)
    fused = np.logaddexp(blp + np.log1p(-lam), mlp + np.log(lam))
    norm = np.log(np.exp(bl - bl.max(-1, keepdims=True)).sum(
        -1, keepdims=True)) + bl.max(-1, keepdims=True)
    np.testing.assert_allclose(got, fused + norm, rtol=1e-4, atol=1e-4)
    # lambda extremes short-circuit
    np.testing.assert_allclose(
        np.asarray(fuse_logits(b, m, 50, lambda_value=0.0)), np.asarray(b),
        rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(fuse_logits(b, m, 50, lambda_value=1.0)), np.asarray(m),
        rtol=1e-6)
    # vocab alignment: wider memory vocab slices down
    m2 = jnp.concatenate([m, jnp.full((3, 10), 5.0)], axis=-1)
    np.testing.assert_allclose(
        np.asarray(fuse_logits(b, m2, 50, lambda_value=lam)), got, rtol=1e-5)


def test_memdecode_lambda0_matches_base(tiny_model_dir, mem_model_dir):
    """lambda=0 routes everything to the base distribution: token-identical
    to a plain engine (the memory model runs but cannot change outputs)."""
    prompt = [5, 17, 42, 99, 7, 23, 8]
    base = _engine(tiny_model_dir)
    try:
        want = _gen(base, prompt)
    finally:
        base.close()
    md = _engine(tiny_model_dir, memdecode={
        'memory_model_path': mem_model_dir, 'lambda_value': 0.0})
    try:
        from lmdeploy_tpu.engine.memdecode import MemDecodeModel
        assert isinstance(md.model_agent.model, MemDecodeModel)
        kc = md.model_agent.cache_engine.kv_cache
        assert set(kc.keys()) == {'pages', 'mem_pages'}
        assert _gen(md, prompt) == want
    finally:
        md.close()


def test_memdecode_fused_matches_manual_fusion(tiny_model_dir, mem_model_dir):
    """lambda=0.5 greedy continuation equals a host-side two-engine
    simulation fusing log-probs step by step."""
    from lmdeploy_tpu.config import ModelConfig
    from lmdeploy_tpu.models import build_model
    from lmdeploy_tpu.weight_loader import load_model_params
    from lmdeploy_tpu.engine.model_agent import AttnMeta
    from lmdeploy_tpu.ops.attention import kv_row_width

    prompt = [5, 17, 42, 99, 7, 23, 8]
    n = 5

    def greedy_fused(lam):
        """Host loop: full forwards of both models per step, fuse, argmax."""
        outs = []
        ids = list(prompt)
        import jax
        models = []
        for d in (tiny_model_dir, mem_model_dir):
            cfg = ModelConfig.from_pretrained(d, dtype='float32')
            model = build_model(cfg)
            params = load_model_params(model, d, None, None)
            models.append((model, params, cfg))
        from lmdeploy_tpu.nn.layers import make_rope_table
        for _ in range(n):
            lps = []
            for model, params, cfg in models:
                T = len(ids)
                _, rowp = kv_row_width(cfg.num_key_value_heads, cfg.head_dim)
                kc = jnp.zeros((cfg.num_layers, 8, 2, 64, rowp), jnp.float32)
                cos, sin = make_rope_table(cfg.rope_dim, 256, cfg.rope_theta)
                meta = AttnMeta(
                    block_tables=jnp.asarray([[1, 2, 3, 4]], jnp.int32),
                    history_lens=jnp.asarray([0], jnp.int32),
                    q_lens=jnp.asarray([T], jnp.int32))
                logits, _ = model.forward(
                    params, jnp.asarray([ids], jnp.int32),
                    jnp.asarray([np.arange(T)], jnp.int32), kc, meta,
                    jnp.asarray(cos), jnp.asarray(sin))
                lps.append(np.asarray(logits[0], np.float64))
            def logsm(x):
                x = x - x.max()
                return x - np.log(np.exp(x).sum())
            fused = np.logaddexp(logsm(lps[0]) + np.log1p(-lam),
                                 logsm(lps[1]) + np.log(lam))
            tok = int(np.argmax(fused))
            outs.append(tok)
            ids.append(tok)
        return outs

    want = greedy_fused(0.5)
    md = _engine(tiny_model_dir, memdecode={
        'memory_model_path': mem_model_dir, 'lambda_value': 0.5})
    try:
        assert _gen(md, prompt, n=n) == want
    finally:
        md.close()


def test_memdecode_adaptive_router(tiny_model_dir, mem_model_dir, tmp_path):
    """A RouterNetwork checkpoint (safetensors + router_config.json) loads and
    steers fusion; the engine runs end-to-end."""
    from safetensors.numpy import save_file
    from conftest import TINY_CFG

    H = TINY_CFG['hidden_size']
    rng = np.random.RandomState(3)
    spd, hid = 8, 16
    state = {}
    for i in range(4):
        state[f'scalar_projectors.{i}.0.weight'] = \
            rng.randn(spd, 1).astype(np.float32)
        state[f'scalar_projectors.{i}.0.bias'] = \
            rng.randn(spd).astype(np.float32)
    in_dim = 2 * H + 4 * spd
    state['mlp.0.weight'] = rng.randn(hid, in_dim).astype(np.float32) * 0.1
    state['mlp.0.bias'] = np.zeros(hid, np.float32)
    state['mlp.3.weight'] = rng.randn(2, hid).astype(np.float32) * 0.1
    state['mlp.3.bias'] = np.zeros(2, np.float32)
    rdir = tmp_path / 'router'
    rdir.mkdir()
    save_file(state, str(rdir / 'router_step100.safetensors'))
    with open(rdir / 'router_config.json', 'w') as f:
        json.dump({'num_layers': 2, 'input_mode': 'both', 'use_scalars': True,
                   'scalar_proj_dim': spd, 'hidden_dim': hid}, f)

    prompt = [5, 17, 42, 99, 7, 23, 8]
    md = _engine(tiny_model_dir, memdecode={
        'memory_model_path': mem_model_dir, 'adaptive_router': True,
        'router_path': str(rdir)})
    try:
        out = _gen(md, prompt)
        assert len(out) == 6
    finally:
        md.close()
