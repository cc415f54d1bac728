"""Decompose single-chip decode-step time into its physical components.

VERDICT r1 item 2: the TinyLlama bench runs at ~14-18% of the v5e
weight-streaming roofline.  This harness measures, on the real chip:

  stream    pure HBM read of all decoder weights (the per-step floor)
  gemm      decode run with attention+fill patched out (projection stack)
  +fill     gemm + the KV scatter
  +attn     gemm + fill + paged-decode kernel  (= the full forward)
  full      the shipping greedy decode run (forward + argmax + state)
  sampled   the shipping full-sampling decode run

Each is a k-step lax.scan dispatched once (so tunnel RTT amortizes), timed
over the best of REPS dispatches.  Differences between rows isolate each
component's cost per decode step.

Usage:  python benchmark/profile_decode.py  [CTX=192] [BATCH=64] [K=16]
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CTX = int(os.environ.get('CTX', '192'))
BATCH = int(os.environ.get('BATCH', '64'))
K = int(os.environ.get('K', '16'))
REPS = int(os.environ.get('REPS', '5'))
BLOCK = int(os.environ.get('BLOCK', '128'))
QUANT = os.environ.get('QUANT', '')


def build_agent():
    from lmdeploy_tpu.config import (CacheConfig, DistConfig, EngineConfigBundle,
                                     MiscConfig, ModelConfig, SchedulerConfig)
    from lmdeploy_tpu.engine.model_agent import ModelAgent

    model_cfg = ModelConfig(
        num_layers=22, num_attention_heads=32, num_key_value_heads=4,
        hidden_size=2048, intermediate_size=5632, vocab_size=32000,
        head_dim=64, max_position_embeddings=2048, dtype='bfloat16',
        eos_token_id=[2])
    if QUANT == 'w4a16':
        model_cfg.quantization_config = {'quant_method': 'awq', 'bits': 4,
                                         'group_size': 128}
    session = CTX + K * 4 + 128
    bundle = EngineConfigBundle(
        model=model_cfg,
        cache=CacheConfig(block_size=BLOCK, num_gpu_blocks=0,
                          cache_max_entry_count=0.7, max_prefill_token_num=4096),
        scheduler=SchedulerConfig(max_batch_size=BATCH, max_session_len=session,
                                  max_prefill_token_num=4096, max_prefill_batch=16),
        dist=DistConfig(),
        misc=MiscConfig(empty_init=True),
    )
    return ModelAgent(bundle)


def activate_rows(agent):
    """Put BATCH active rows with CTX cached tokens into the decode state."""
    bs = agent.cache_config.block_size
    blocks_per = (CTX + K * 4 + bs - 1) // bs
    tables = np.zeros((BATCH, agent.state_table_width), np.int32)
    nxt = 1                              # block 0 = padding block
    for i in range(BATCH):
        tables[i, :blocks_per] = np.arange(nxt, nxt + blocks_per)
        nxt += blocks_per
    assert nxt <= agent.num_blocks, (nxt, agent.num_blocks)
    rows = {
        'token': np.full(BATCH, 17, np.int32),
        'position': np.full(BATCH, CTX, np.int32),
        'tables': tables,
        'active': np.ones(BATCH, bool),
        'step_no': np.zeros(BATCH, np.int32),
        'do_sample': np.zeros(BATCH, bool),
        'seed': np.zeros(BATCH, np.uint32),
    }
    agent._apply_insert(np.arange(BATCH, dtype=np.int32), rows)


def reset_positions(agent):
    agent._apply_insert(np.arange(BATCH, dtype=np.int32), {
        'position': np.full(BATCH, CTX, np.int32),
        'step_no': np.zeros(BATCH, np.int32)})


def time_run(agent, label, simple=True, reps=REPS):
    """Slope timing: t(4K) - t(K) over 3K steps cancels the tunnel's
    ~38-54 ms dispatch+fetch RTT, isolating true device time per step."""
    def best_of(k):
        best = float('inf')
        for _ in range(reps):
            reset_positions(agent)
            t0 = time.perf_counter()
            out = agent.decode_run(BATCH, k=k, simple=simple)
            out.tokens_np()
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = best_of(K)
    t4 = best_of(4 * K)
    ms_step = (t4 - t1) / (3 * K) * 1e3
    toks = BATCH / ms_step * 1e3
    print(f'{label:<10s} {ms_step:8.3f} ms/step   {toks:9.0f} tok/s   '
          f'(t{K}={t1 * 1e3:.1f}ms t{4 * K}={t4 * 1e3:.1f}ms)')
    return ms_step


def time_stream(agent):
    """Pure weight read: one pass over decoder weights + lm_head, k times."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def stream(params):
        def body(c, w):
            s = jnp.float32(0)
            for leaf in jax.tree_util.tree_leaves(w):
                s += jnp.sum(leaf, dtype=jnp.float32) if leaf.dtype != jnp.bfloat16 \
                    else jnp.sum(leaf.astype(jnp.float32))
            return c + s, None
        c, _ = jax.lax.scan(body, jnp.float32(0), params['layers'])
        c += jnp.sum(params['embed'].astype(jnp.float32))
        if 'lm_head' in params:
            c += jnp.sum(params['lm_head'].astype(jnp.float32))
        return c

    @jax.jit
    def nop(x):
        return x + 1

    def best_of(fn, *a):
        np.asarray(fn(*a))
        best = float('inf')
        for _ in range(REPS):
            t0 = time.perf_counter()
            np.asarray(fn(*a))
            best = min(best, time.perf_counter() - t0)
        return best

    rtt = best_of(nop, jnp.zeros((), jnp.float32))
    t = max(best_of(stream, agent.params) - rtt, 1e-9)
    nbytes = sum(x.nbytes for x in jax.tree_util.tree_leaves(agent.params))
    gbs = nbytes / t / 1e9
    print(f'{"stream":<10s} {t * 1e3:8.3f} ms/pass    {gbs:6.0f} GB/s '
          f'({nbytes / 1e9:.2f} GB of params; rtt {rtt * 1e3:.1f} ms)')
    return t * 1e3, gbs


def main():
    import jax
    import jax.numpy as jnp
    import lmdeploy_tpu.models.llama as llama_mod

    print(f'backend={jax.default_backend()} ctx={CTX} batch={BATCH} k={K}')
    agent = build_agent()
    activate_rows(agent)

    kv_bytes_step = (22 * 4 * BATCH * CTX * 64 * 2 * 2)
    w = agent.params
    wbytes = sum(x.nbytes for x in jax.tree_util.tree_leaves(w))
    print(f'weights {wbytes / 1e9:.2f} GB; KV read/step ~{kv_bytes_step / 1e6:.0f} MB '
          f'-> roofline {(wbytes + kv_bytes_step) / 819e9 * 1e3:.2f} ms/step '
          f'({BATCH / ((wbytes + kv_bytes_step) / 819e9):.0f} tok/s)')

    stream_ms, gbs = time_stream(agent)

    real_attn = llama_mod.paged_attention
    real_fill = llama_mod.fill_kv_cache

    def zero_attn(q, kv_cache, *a, **kw):
        B, T, Hq, D = q.shape
        return jnp.zeros((B, T, Hq, D), q.dtype)

    def no_fill(kv_cache, *a, **kw):
        return kv_cache

    # gemm only: no attention kernel, no scatter
    llama_mod.paged_attention = zero_attn
    llama_mod.fill_kv_cache = no_fill
    agent._step_fns.clear()
    gemm = time_run(agent, 'gemm')

    # + fill scatter
    llama_mod.fill_kv_cache = real_fill
    agent._step_fns.clear()
    gemm_fill = time_run(agent, '+fill')

    # + attention (full forward)
    llama_mod.paged_attention = real_attn
    agent._step_fns.clear()
    full = time_run(agent, 'full')
    sampled = time_run(agent, 'sampled', simple=False)

    print(json.dumps({
        'ctx': CTX, 'batch': BATCH, 'k': K,
        'stream_ms': round(stream_ms, 3), 'stream_gbs': round(gbs, 1),
        'gemm_ms': round(gemm, 3),
        'fill_ms': round(gemm_fill - gemm, 3),
        'attn_ms': round(full - gemm_fill, 3),
        'sampling_extra_ms': round(sampled - full, 3),
        'full_ms': round(full, 3),
        'tok_s_simple': round(BATCH / full * 1e3, 1),
    }))


if __name__ == '__main__':
    main()
