"""Decompose prefill/TTFT time into kernel, step-fn, and engine shares.

VERDICT r3 weak #2: ttft_p50 = 3097 ms for a 2048-token prompt at 8-way
concurrency implies ~5k tok/s aggregate prefill on a 1.1B model — single-digit
MFU on a 197-TFLOP chip.  This harness measures, on the real chip:

  flash       flash_prefill_attention alone at [B, T] (the attention share)
  step        the full jitted prefill step (embed+proj+attn+fill+sample)
  engine      agent.prefill() wall time incl. host batch composition

Each timed best-of-REPS after a compile warmup.  MFU is reported against the
v5e peak (197 TFLOP/s bf16).

Usage: python benchmark/profile_prefill.py  [T=2048] [B=2] [REPS=5]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

T = int(os.environ.get('T', '2048'))
B = int(os.environ.get('B', '2'))
REPS = int(os.environ.get('REPS', '5'))
QUANT = os.environ.get('QUANT', '')

# TinyLlama-1.1B geometry
GEOM = dict(num_layers=22, num_attention_heads=32, num_key_value_heads=4,
            hidden_size=2048, intermediate_size=5632, vocab_size=32000,
            head_dim=64)
PEAK_TFLOPS = 197.0


def model_flops(ntok: int) -> float:
    """Dense fwd FLOPs (2*params matmul + attention) for GEOM."""
    g = GEOM
    H, I, L, V = (g['hidden_size'], g['intermediate_size'], g['num_layers'],
                  g['vocab_size'])
    qo = g['num_attention_heads'] * g['head_dim']
    kvo = g['num_key_value_heads'] * g['head_dim']
    per_tok = L * 2 * (H * qo + 2 * H * kvo + qo * H + 3 * H * I) + 2 * H * V
    # causal attention: ~2 * 2 * Hq * D * T^2/2 per seq, per layer
    attn = L * 2 * 2 * qo * (T * T / 2) * (ntok // T)
    return per_tok * ntok + attn


def best_of(fn, reps=REPS):
    fn()
    best = float('inf')
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    print(f'backend={jax.default_backend()} B={B} T={T} quant={QUANT!r}')
    g = GEOM

    # -- 1. flash kernel alone ---------------------------------------------
    from lmdeploy_tpu.ops.pallas.flash_prefill import flash_prefill_attention
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, T, g['num_attention_heads'], g['head_dim']),
                    jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, T, g['num_key_value_heads'], g['head_dim']),
                    jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, T, g['num_key_value_heads'], g['head_dim']),
                    jnp.bfloat16)
    scale = 1.0 / np.sqrt(g['head_dim'])

    def run_flash():
        jax.block_until_ready(flash_prefill_attention(q, k, v, scale))

    t_flash = best_of(run_flash)
    # one layer's attention flops: QK^T + PV = 2 * 2 * Hq*D * T^2/2 per seq
    aflops = B * 2 * 2 * (g['num_attention_heads'] * g['head_dim']) * T * T / 2
    print(f'flash[{B}x{T}]   {t_flash*1e3:8.2f} ms  '
          f'{aflops/t_flash/1e12:6.1f} TF/s  (one layer; '
          f'x{g["num_layers"]} layers = {t_flash*1e3*g["num_layers"]:.0f} ms)')

    # -- 2. full prefill step fn -------------------------------------------
    from lmdeploy_tpu.config import (CacheConfig, DistConfig, EngineConfigBundle,
                                     MiscConfig, ModelConfig, SchedulerConfig)
    from lmdeploy_tpu.engine.model_agent import ModelAgent
    qcfg = None
    if QUANT == 'w4a16':
        qcfg = {'quant_method': 'awq', 'bits': 4, 'group_size': 128}
    model_cfg = ModelConfig(max_position_embeddings=max(2048, T + 256),
                            dtype='bfloat16', eos_token_id=[2],
                            quantization_config=qcfg, **GEOM)
    bundle = EngineConfigBundle(
        model=model_cfg,
        cache=CacheConfig(block_size=128, num_gpu_blocks=0,
                          cache_max_entry_count=0.7,
                          max_prefill_token_num=B * T),
        scheduler=SchedulerConfig(max_batch_size=64, max_session_len=T + 256,
                                  max_prefill_token_num=B * T,
                                  max_prefill_batch=16),
        dist=DistConfig(), misc=MiscConfig(empty_init=True))
    agent = ModelAgent(bundle)

    from lmdeploy_tpu.paging.seq import SamplingParams, SequenceManager
    sm = SequenceManager(bundle.cache.block_size)
    from lmdeploy_tpu.paging.scheduler import PrefillChunk

    def make_chunks():
        chunks = []
        nxt = 1
        blocks_per = (T + 127) // 128 + 2
        for i in range(B):
            sess = sm.add_session(1000 + i)
            seq = sess.add_sequence(
                rng.randint(10, 31000, size=T).tolist(), SamplingParams())
            seq.logical_blocks = list(range(nxt, nxt + blocks_per))
            nxt += blocks_per
            chunks.append(PrefillChunk(seq=seq, start=0, length=T,
                                       is_last=True))
        return chunks

    chunks = make_chunks()

    def run_step():
        out = agent.prefill(chunks)
        out.tokens_np()
        for c in chunks:
            c.seq.batch_slot = -1        # keep slot assignment stable
        agent._free_slots = list(range(agent.max_batch))
        agent._pending_deactivate.clear()

    t_step = best_of(run_step)
    ntok = B * T
    fl = model_flops(ntok)
    print(f'step[{B}x{T}]    {t_step*1e3:8.2f} ms  '
          f'{fl/t_step/1e12:6.1f} TF/s  MFU={fl/t_step/1e12/PEAK_TFLOPS*100:.1f}%'
          f'  ({ntok/t_step:,.0f} tok/s)')

    import json
    print(json.dumps({
        'B': B, 'T': T, 'quant': QUANT,
        'flash_ms': round(t_flash * 1e3, 2),
        'flash_tf': round(aflops / t_flash / 1e12, 1),
        'step_ms': round(t_step * 1e3, 2),
        'step_tok_s': round(ntok / t_step, 0),
        'mfu_pct': round(fl / t_step / 1e12 / PEAK_TFLOPS * 100, 1),
    }))


if __name__ == '__main__':
    main()
