"""Block-size autotune for the W4A16 bitcast kernel on the real chip.

Long serial chains (R=600/1800 slope) make single-shape timings robust to the
tunnel's RPC noise; results print as JSON so good defaults can be baked into
quant_matmul.py.  Shapes = TinyLlama fused-projection geometry + llama-8B.

Usage: python benchmark/tune_w4a16.py [> tune.json]
"""
import functools
import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from lmdeploy_tpu.ops.pallas.quant_matmul import quantize_w4, w4a16_matmul

SHAPES = [
    (2048, 2560),      # tinyllama fused qkv
    (2048, 2048),      # o_proj
    (2048, 11264),     # fused gate_up
    (5632, 2048),      # down
    (4096, 14336),     # llama-8B gate/up
    (14336, 4096),     # llama-8B down
]
B = int(os.environ.get('TUNE_B', '64'))
R = int(os.environ.get('TUNE_R', '600'))
REPS = int(os.environ.get('TUNE_REPS', '3'))


def chained(matmul, R):
    @jax.jit
    def run(x, *w):
        def step(c, _):
            y = matmul(c, *w)
            return c + 1e-30 * jnp.max(y).astype(c.dtype), ()
        c, _ = jax.lax.scan(step, x, None, length=R)
        return c
    return run


def _time_call(run, xs, *w):
    np.asarray(run(xs[0], *w))
    best = float('inf')
    for x in xs[1:]:
        t0 = time.perf_counter()
        np.asarray(run(x, *w))
        best = min(best, time.perf_counter() - t0)
    return best


def timeit(matmul, xs, *w):
    t_lo = _time_call(chained(matmul, R), xs, *w)
    t_hi = _time_call(chained(matmul, 3 * R), xs, *w)
    return max((t_hi - t_lo) / (2 * R), 1e-9)


def main():
    rng = np.random.RandomState(0)
    results = {}
    for K, N in SHAPES:
        w = jnp.asarray(rng.randn(K, N).astype(np.float32) * 0.02,
                        jnp.bfloat16)
        packed, scales, zeros = quantize_w4(w)
        xs = [jnp.asarray(rng.randn(B, K).astype(np.float32), jnp.bfloat16)
              for _ in range(REPS + 1)]
        gib = packed.size * 4 / 2**30
        rows = []
        for bk, bn in itertools.product((512, 1024, 2048, 4096),
                                        (512, 1024, 2048)):
            if bn > N:
                continue
            fn = functools.partial(w4a16_matmul, block_n=bn, block_k=bk)
            try:
                t = timeit(fn, xs, packed, scales, zeros)
            except Exception as e:  # noqa: BLE001
                print(f'# K{K} N{N} bk{bk} bn{bn}: {type(e).__name__}',
                      file=sys.stderr)
                continue
            rows.append({'bk': bk, 'bn': bn, 'us': round(t * 1e6, 2),
                         'gbs': round(gib / t, 1)})
            print(f'# K{K} N{N} bk{bk} bn{bn}: {t * 1e6:.2f}us '
                  f'{gib / t:.0f} GB/s', file=sys.stderr, flush=True)
        rows.sort(key=lambda r: r['us'])
        results[f'{K}x{N}'] = rows
        print(json.dumps({f'{K}x{N}': rows[:3]}), flush=True)
    print(json.dumps(results))


if __name__ == '__main__':
    main()
