"""Schedule shoot-out for W4A16 decode GEMMs at serving M, on the real chip.

Two harnesses per schedule:
  * stacked: L layers of DISTINCT weights, lax.scan with dynamic per-layer
    slicing — the real decode regime (weights must stream from HBM).
  * single: one weight re-used R times (the old tune harness) — included to
    quantify how much VMEM caching of loop-invariant weights inflates it.

Usage: python benchmark/bench_m64_sched.py [shape_idx ...]
Env: M (64), L (22), R (100)
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

from lmdeploy_tpu.ops.pallas.quant_matmul import (
    prep_w4, quantize_w4, w4a16_matmul, w4a16_matmul_stacked)

SHAPES = [
    (2048, 2560),      # tinyllama fused qkv
    (2048, 2048),      # o_proj
    (2048, 11264),     # fused gate_up
    (5632, 2048),      # down
    (4096, 14336),     # llama-8B gate/up
    (14336, 4096),     # llama-8B down
]
M = int(os.environ.get('M', '64'))
L = int(os.environ.get('L', '22'))
R = int(os.environ.get('R', '100'))


def stacked_run(matmul, reps):
    """scan over L layers, slicing stacked weights — defeats VMEM caching."""
    @jax.jit
    def run(x, *stacks):
        def layer(c, ws):
            y = matmul(c, *ws)
            return c + 1e-30 * y[:, :1].astype(c.dtype), ()
        def rep(c, _):
            c, _ = jax.lax.scan(layer, c, stacks)
            return c, ()
        c, _ = jax.lax.scan(rep, x, None, length=reps)
        return c
    return run


def stacked_idx_run(matmul, reps):
    """scan carrying a layer index; full stacks ride as closure constants —
    the stacked-kernel calling convention (no per-layer slice)."""
    @jax.jit
    def run(x, *stacks):
        def layer(carry, _):
            c, l = carry
            y = matmul(c, l, *stacks)
            return (c + 1e-30 * y[:, :1].astype(c.dtype), l + 1), ()
        def rep(c, _):
            (c, _l), _ = jax.lax.scan(layer, (c, jnp.int32(0)), None,
                                      length=L)
            return c, ()
        c, _ = jax.lax.scan(rep, x, None, length=reps)
        return c
    return run


def _time_call(run, xs, *w):
    np.asarray(run(xs[0], *w))          # compile + warm
    best = float('inf')
    for x in xs[1:]:
        t0 = time.perf_counter()
        np.asarray(run(x, *w))
        best = min(best, time.perf_counter() - t0)
    return best


def timeit(make_run, xs, *w):
    """slope timing: (t(3R) - t(R)) / 2R cancels tunnel-transfer constants."""
    t_lo = _time_call(make_run(R), xs, *w)
    t_hi = _time_call(make_run(3 * R), xs, *w)
    return max((t_hi - t_lo) / (2 * R), 1e-9) / L


def main():
    idxs = [int(a) for a in sys.argv[1:]] or list(range(len(SHAPES)))
    rng = np.random.RandomState(0)
    out = {}
    for i in idxs:
        K, N = SHAPES[i]
        packs, ss, zs, ws = [], [], [], []
        for l in range(L):
            w = jnp.asarray(rng.randn(K, N).astype(np.float32) * 0.02,
                            jnp.bfloat16)
            p, s, z = quantize_w4(w)
            packs.append(p); ss.append(s); zs.append(z); ws.append(w)
        stacks = (jnp.stack(packs), jnp.stack(ss), jnp.stack(zs))
        wstack = jnp.stack(ws)
        del packs, ss, zs, ws
        xs = [jnp.asarray(rng.randn(M, K).astype(np.float32), jnp.bfloat16)
              for _ in range(4)]
        pgib = stacks[0].size // L * 4 / 2**30     # packed GiB per layer
        dgib = wstack.size // L * 2 / 2**30        # dense GiB per layer

        res = {}
        dense = lambda c, w: jnp.dot(
            c, w, preferred_element_type=jnp.float32).astype(c.dtype)
        t = timeit(lambda r: stacked_run(dense, r), xs, wstack)
        res['bf16_dense'] = {'us': round(t * 1e6, 2),
                             'gbs': round(dgib / t, 1)}
        t = timeit(lambda r: stacked_run(w4a16_matmul, r), xs, *stacks)
        res['groupdot'] = {'us': round(t * 1e6, 2), 'gbs': round(pgib / t, 1)}
        sb, zc = prep_w4(stacks[1], stacks[2])
        t = timeit(lambda r: stacked_idx_run(
            lambda c, l, p, s, z: w4a16_matmul_stacked(c, p, s, z, l), r),
            xs, stacks[0], sb, zc)
        res['stacked_deq'] = {'us': round(t * 1e6, 2),
                              'gbs': round(pgib / t, 1)}
        sp, zp = prep_w4(stacks[1], stacks[2], precise=True)
        t = timeit(lambda r: stacked_idx_run(
            lambda c, l, p, s, z: w4a16_matmul_stacked(c, p, s, z, l), r),
            xs, stacks[0], sp, zp)
        res['stacked_precise'] = {'us': round(t * 1e6, 2),
                                  'gbs': round(pgib / t, 1)}
        sg, zg = prep_w4(stacks[1], stacks[2], mode='gd')
        t = timeit(lambda r: stacked_idx_run(
            lambda c, l, p, s, z: w4a16_matmul_stacked(c, p, s, z, l), r),
            xs, stacks[0], sg, zg)
        res['stacked_gd'] = {'us': round(t * 1e6, 2),
                             'gbs': round(pgib / t, 1)}
        out[f'{K}x{N}'] = res
        print(json.dumps({f'{K}x{N}': res}), flush=True)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
