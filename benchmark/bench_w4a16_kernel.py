"""Microbench: fused W4A16 Pallas kernel vs dequant+dense vs pure bf16 dense.

Decides the _DENSE_SWITCH crossover (nn/linear.py): at decode batch sizes the
GEMM is weight-bandwidth-bound and reading 4 bits/weight should win ~4x over
bf16.  Run on the real TPU:  python benchmark/bench_w4a16_kernel.py

Measurement method: R matmuls chained inside ONE jitted lax.scan with a serial
data dependency (the carry is perturbed by each result), so (a) per-dispatch
tunnel overhead (~20us on the axon relay) amortizes away and (b) nothing can be
cached or hoisted — the weight is re-streamed from HBM every step.  Naive
per-call timing on this stack returns pure RPC noise (it "measured" 7 TB/s).

Reference analog: the reason turbomind's 22k-LoC gemm library exists
(src/turbomind/kernels/gemm/gemm.h:14, docs/en/quantization/w4a16.md:119).
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from lmdeploy_tpu.ops.pallas.quant_matmul import (quantize_w4, w4a16_matmul,
                                                  w4a16_matmul_reference)

# llama-3-8b decode linears (K, N) + tinyllama's
SHAPES = [
    (4096, 4096),    # wq / wo (8B)
    (4096, 14336),   # gate/up (8B)
    (14336, 4096),   # down (8B)
]
BATCHES = [int(b) for b in os.environ.get('BENCH_BATCHES',
                                          '1,32,64,128').split(',')]
if os.environ.get('BENCH_SHAPES'):
    SHAPES = [tuple(int(v) for v in s.split('x'))
              for s in os.environ['BENCH_SHAPES'].split(',')]
R = int(os.environ.get('BENCH_R', '100'))


def chained(matmul, R):
    """One jitted program: R serially-dependent matmuls over the same weight."""
    @jax.jit
    def run(x, *w):
        def step(c, _):
            y = matmul(c, *w)
            # serial dependency: fold a scalar of y back into the carry.
            # max (not sum!) — XLA reassociates sum(c@W) into c@(W.sum(1)),
            # hoisting the weight reduction out of the loop entirely.
            return c + 1e-30 * jnp.max(y).astype(c.dtype), ()
        c, _ = jax.lax.scan(step, x, None, length=R)
        return c
    return run


def _time_call(run, xs, *w):
    """min wall time of run() over DISTINCT inputs, timed by host FETCH.

    On the tunneled axon stack, ``block_until_ready`` does not reliably wait
    for device execution and repeated identical calls can be served from a
    relay cache — np.asarray of a fresh input's result is the only timing that
    matched a hand-checked HBM roofline.  Warm on xs[0], fetch-time the rest,
    take the min."""
    np.asarray(run(xs[0], *w))              # compile + warm
    best = float('inf')
    for x in xs[1:]:
        t0 = time.perf_counter()
        np.asarray(run(x, *w))
        best = min(best, time.perf_counter() - t0)
    return best


def timeit(matmul, xs, *w):
    """Per-matmul time via the SLOPE between two chain lengths.

    Even a chained scan carries a large constant per-call cost on this stack
    (~26 ms measured: RPC + fetch + run launch), which at R=300 still inflates
    per-step time ~50%.  Timing R and 3R and taking the slope cancels the
    constant exactly: t_step = (T(3R) - T(R)) / 2R."""
    t_lo = _time_call(chained(matmul, R), xs, *w)
    t_hi = _time_call(chained(matmul, 3 * R), xs, *w)
    return max((t_hi - t_lo) / (2 * R), 1e-9)


def main():
    rng = np.random.RandomState(0)
    results = []
    for K, N in SHAPES:
        w = jnp.asarray(rng.randn(K, N).astype(np.float32) * 0.02, jnp.bfloat16)
        packed, scales, zeros = quantize_w4(w)
        wd = jax.device_put(w)
        gib_w4 = (packed.size * packed.dtype.itemsize
                  + scales.size * 4 + zeros.size * 4) / 2**30
        gib_bf16 = K * N * 2 / 2**30
        dense = lambda a, ww: jnp.dot(  # noqa: E731
            a, ww, preferred_element_type=jnp.float32).astype(a.dtype)
        for B in BATCHES:
            xs = [jnp.asarray(rng.randn(B, K).astype(np.float32), jnp.bfloat16)
                  for _ in range(4)]
            t_fused = timeit(w4a16_matmul, xs, packed, scales, zeros)
            t_ref = timeit(w4a16_matmul_reference, xs, packed, scales, zeros)
            t_dense = timeit(dense, xs, wd)
            row = dict(K=K, N=N, B=B,
                       fused_us=round(t_fused * 1e6, 1),
                       dequant_dense_us=round(t_ref * 1e6, 1),
                       dense_bf16_us=round(t_dense * 1e6, 1),
                       fused_GBps=round(gib_w4 / t_fused, 1),
                       dense_GBps=round(gib_bf16 / t_dense, 1),
                       speedup_vs_dense=round(t_dense / t_fused, 2),
                       speedup_vs_ref=round(t_ref / t_fused, 2))
            results.append(row)
            print(json.dumps(row), flush=True)
    for K, N in SHAPES:
        rows = [r for r in results if r['K'] == K and r['N'] == N]
        wins = [r['B'] for r in rows
                if r['fused_us'] < r['dense_bf16_us']
                and r['fused_us'] < r['dequant_dense_us']]
        print(f'# ({K},{N}) fused wins at B={wins}', flush=True)


if __name__ == '__main__':
    main()
