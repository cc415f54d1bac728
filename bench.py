"""Benchmark: continuous-batching decode throughput + TTFT on one TPU chip.

Parent/child design hardened against TPU-backend flakiness (round-2 postmortem:
BENCH_r02.json was an `Unable to initialize backend 'axon': UNAVAILABLE` traceback).
The parent process never imports jax; it

  1. probes the backend with a tiny jitted matmul in a subprocess, retrying with
     backoff while the stack is degraded (a wedged RPC ignores SIGTERM -> children
     are killed with SIGKILL on their whole process group),
  2. runs each measurement phase (bf16 decode, w4a16 decode, p50 TTFT on a
     2048-token prompt **at W4A16** — the BASELINE.json north-star config) as its
     own subprocess so one wedged phase cannot erase the others, re-probing +
     retrying a phase once on failure,
  3. always emits ONE JSON line combining whatever succeeded.

Baseline for vs_baseline: reference static-decode llama2-7b fp16 bs64 128/2048 on
A100-80G = 1852.06 out tok/s (docs/en/benchmark/a100_fp16.md:54, see BASELINE.md).
The headline metric stays the bf16 number for r1/r2 continuity; `w4a16_tok_s` and
`ttft_p50_ms` ride as extra fields (BASELINE.json north-star shape).

Child phases run the full engine stack (scheduler + paged KV + jitted forward +
fused sampling) on a TinyLlama-1.1B-geometry model (random weights; throughput is
weight-value independent).
"""
import json
import os
import signal
import subprocess
import sys
import time

BATCH = int(os.environ.get('BENCH_BATCH', '64'))
PROMPT_LEN = int(os.environ.get('BENCH_PROMPT', '128'))
# 256-out rounds (vs 128 in r1-r4): longer decode chains make the
# decode-only slope reflect pipelined steady state instead of ramp
# tails; the reference's static-decode rows use 2048-out
NEW_TOKENS = int(os.environ.get('BENCH_NEW', '256'))
TTFT_PROMPT = int(os.environ.get('BENCH_TTFT_PROMPT', '2048'))
TTFT_BATCH = int(os.environ.get('BENCH_TTFT_BATCH', '8'))
ROUNDS = int(os.environ.get('BENCH_ROUNDS', '3'))   # median-of-N slopes
BASELINE = 1852.06

# nominal peaks for the chip family, recorded in the artifact so MFU /
# roofline claims are anchored (VERDICT r4 weak #6: earlier rounds mixed
# v5e and v6e constants).  Keyed by jax device_kind prefix.
CHIP_PEAKS = {
    'TPU v5 lite': {'hbm_gbs': 819.0, 'bf16_tflops': 197.0},   # v5e
    'TPU v5': {'hbm_gbs': 1228.0, 'bf16_tflops': 459.0},       # v5p
    'TPU v6 lite': {'hbm_gbs': 1640.0, 'bf16_tflops': 918.0},  # v6e
}

PROBE_RETRIES = int(os.environ.get('BENCH_PROBE_RETRIES', '10'))
PROBE_TIMEOUT = float(os.environ.get('BENCH_PROBE_TIMEOUT', '150'))
PROBE_BACKOFF = float(os.environ.get('BENCH_PROBE_BACKOFF', '45'))
PHASE_TIMEOUT = float(os.environ.get('BENCH_PHASE_TIMEOUT', '1200'))

# BENCH_FORCE_CPU=1 pins children to the CPU backend (the axon sitecustomize
# overrides the JAX_PLATFORMS env var, so it must go through jax.config) —
# used to exercise this harness without TPU access.
_FORCE_CPU = os.environ.get('BENCH_FORCE_CPU', '') == '1'
_CPU_PIN = ("import jax; jax.config.update('jax_platforms', 'cpu');"
            if _FORCE_CPU else '')
_PROBE_SRC = (_CPU_PIN +
              "import jax, jax.numpy as jnp;"
              "x = jnp.ones((256, 256), jnp.bfloat16);"
              "print(float(jax.jit(lambda a: (a @ a).sum())(x)))")


# --------------------------------------------------------------------------
# parent-side orchestration (no jax imports here)
# --------------------------------------------------------------------------

def _run_killable(cmd, timeout, env=None):
    """Run cmd in its own process group; SIGKILL the group on timeout.

    Returns (rc, stdout_text). rc is None on timeout.
    """
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True,
                            start_new_session=True, env=env)
    try:
        out, _ = proc.communicate(timeout=timeout)
        return proc.returncode, out
    except subprocess.TimeoutExpired:
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            pass
        try:
            out, _ = proc.communicate(timeout=10)
        except subprocess.TimeoutExpired:
            out = ''
        return None, out or ''


def _probe(attempts_log):
    """Retry a tiny jitted matmul until the backend answers."""
    for attempt in range(1, PROBE_RETRIES + 1):
        t0 = time.monotonic()
        rc, out = _run_killable([sys.executable, '-c', _PROBE_SRC],
                                PROBE_TIMEOUT)
        dt = time.monotonic() - t0
        attempts_log.append({'attempt': attempt, 'rc': rc, 'sec': round(dt, 1)})
        if rc == 0:
            return True
        tail = out.strip().splitlines()[-1] if out.strip() else '(no output)'
        print(f'[bench] probe attempt {attempt}/{PROBE_RETRIES} failed '
              f'(rc={rc}, {dt:.0f}s): {tail}', file=sys.stderr, flush=True)
        if attempt < PROBE_RETRIES:
            time.sleep(PROBE_BACKOFF)
    return False


def _run_phase(name, attempts_log):
    """Run one child phase; on failure, re-probe and retry once."""
    cmd = [sys.executable, os.path.abspath(__file__), '--child', name]
    # the rps phase sweeps the widest dispatch-bucket spectrum; on a cold
    # compile cache its warmup alone can exceed the default phase budget
    budget = PHASE_TIMEOUT * (2 if name == 'rps' else 1)
    for attempt in (1, 2):
        t0 = time.monotonic()
        rc, out = _run_killable(cmd, budget)
        dt = time.monotonic() - t0
        print(f'[bench] phase {name} attempt {attempt}: rc={rc} {dt:.0f}s',
              file=sys.stderr, flush=True)
        result = None
        for line in reversed(out.strip().splitlines()):
            if line.startswith('{'):
                try:
                    result = json.loads(line)
                except json.JSONDecodeError:
                    pass
                break
        if rc == 0 and result is not None:
            return result
        tail = '\n'.join(out.strip().splitlines()[-6:])
        print(f'[bench] phase {name} output tail:\n{tail}',
              file=sys.stderr, flush=True)
        if attempt == 1:
            if not _probe(attempts_log):
                break
    return None


def parent_main():
    attempts = []
    out = {
        'metric': (f'decode_tok_s_tinyllama1.1b_bf16_bs{BATCH}'
                   f'_{PROMPT_LEN}i{NEW_TOKENS}o'),
        'value': 0.0,
        'unit': 'out tok/s (1x TPU chip)',
        'vs_baseline': 0.0,
    }
    if not _probe(attempts):
        out['unit'] += ' [backend unavailable after retries]'
        out['probe_attempts'] = attempts
        print(json.dumps(out), flush=True)
        return

    bf16 = _run_phase('bf16', attempts)
    if bf16:
        out['value'] = bf16['tok_s']
        out['vs_baseline'] = round(bf16['tok_s'] / BASELINE, 4)
        for k in ('decode_only_tok_s', 'achieved_gbs', 'hbm_gbs_measured',
                  'roofline_frac', 'device_kind', 'hbm_gbs_nominal',
                  'bf16_tflops_nominal', 'rounds'):
            if k in bf16:
                out[k] = bf16[k]
        if bf16.get('note'):
            out['unit'] += f" [{bf16['note']}]"

    w4 = _run_phase('w4a16', attempts)
    if w4:
        out['w4a16_tok_s'] = w4['tok_s']
        out['w4a16_vs_baseline'] = round(w4['tok_s'] / BASELINE, 4)
        if 'decode_only_tok_s' in w4:
            out['w4a16_decode_only_tok_s'] = w4['decode_only_tok_s']
        if bf16 and bf16['tok_s'] > 0:
            out['w4a16_vs_bf16'] = round(w4['tok_s'] / bf16['tok_s'], 3)
        if bf16 and bf16.get('decode_only_tok_s', 0) > 0 \
                and w4.get('decode_only_tok_s', 0) > 0:
            out['w4a16_vs_bf16_decode_only'] = round(
                w4['decode_only_tok_s'] / bf16['decode_only_tok_s'], 3)
        if bf16 and bf16.get('bs8_decode_only_tok_s', 0) > 0 \
                and w4.get('bs8_decode_only_tok_s', 0) > 0:
            out['bs8_decode_only_tok_s'] = bf16['bs8_decode_only_tok_s']
            out['w4a16_bs8_decode_only_tok_s'] = w4['bs8_decode_only_tok_s']
            out['w4a16_vs_bf16_bs8'] = round(
                w4['bs8_decode_only_tok_s'] / bf16['bs8_decode_only_tok_s'],
                3)

    ttft = _run_phase('ttft', attempts)
    if ttft:
        out['ttft_p50_ms'] = ttft['p50_ms']
        out['ttft_p99_ms'] = ttft['p99_ms']
        out['ttft_prompt_len'] = TTFT_PROMPT
        out['ttft_quant'] = ttft.get('quant', 'w4a16')
        if 'prefill_tok_s' in ttft:
            out['prefill_tok_s'] = ttft['prefill_tok_s']
        if 'cold_ms' in ttft:
            out['ttft_cold_ms'] = ttft['cold_ms']
            out['ttft_cold_prompt_len'] = ttft['cold_prompt_len']

    b7 = _run_phase('llama7b', attempts)
    if b7:
        out['llama7b_w4a16_kv8_tok_s'] = b7['tok_s']
        if 'decode_only_tok_s' in b7:
            out['llama7b_decode_only_tok_s'] = b7['decode_only_tok_s']
        if 'ttft_ms' in b7:
            out['llama7b_ttft_ms'] = b7['ttft_ms']
        # reference: llama2-7b fp16 bs64 static decode = 1852.06 out tok/s
        out['llama7b_vs_baseline'] = round(
            (b7.get('decode_only_tok_s') or b7['tok_s']) / BASELINE, 3)
        for k in ('device_kind', 'hbm_gbs_nominal', 'bf16_tflops_nominal'):
            if k in b7:
                out[k] = b7[k]

    rps = _run_phase('rps', attempts)
    if rps and 'rps' in rps:
        out['rps_sharegpt_like'] = rps['rps']
        out['rps_out_tok_s'] = rps['out_tok_s']
        out['rps_n_requests'] = rps['n_requests']
        out['rps_quant'] = rps.get('quant', '')

    out['probe_attempts'] = len(attempts)
    print(json.dumps(out), flush=True)


# --------------------------------------------------------------------------
# child phases (jax imported only here)
# --------------------------------------------------------------------------

def build_engine(quant='', geometry='tinyllama', kv_policy=0, batch=None):
    from lmdeploy_tpu.config import (CacheConfig, DistConfig, EngineConfigBundle,
                                     MiscConfig, ModelConfig, QuantPolicy,
                                     SchedulerConfig)
    from lmdeploy_tpu.engine.engine import Engine
    from lmdeploy_tpu.messages import TpuEngineConfig

    if geometry == 'llama7b':
        # llama2-7b geometry (BASELINE.md headline rows): 32 MHA layers
        model_cfg = ModelConfig(
            num_layers=32, num_attention_heads=32, num_key_value_heads=32,
            hidden_size=4096, intermediate_size=11008, vocab_size=32000,
            head_dim=128, max_position_embeddings=max(2048, TTFT_PROMPT + 256),
            dtype='bfloat16', eos_token_id=[2])
    else:
        # TinyLlama-1.1B geometry
        model_cfg = ModelConfig(
            num_layers=22, num_attention_heads=32, num_key_value_heads=4,
            hidden_size=2048, intermediate_size=5632, vocab_size=32000,
            head_dim=64, max_position_embeddings=max(2048, TTFT_PROMPT + 256),
            dtype='bfloat16', eos_token_id=[2])
    if quant == 'w4a16':
        # exercise the fused dequant+matmul serving path (random int4 weights)
        model_cfg.quantization_config = {'quant_method': 'awq', 'bits': 4,
                                         'group_size': 128}
    session_len = max(PROMPT_LEN + NEW_TOKENS, TTFT_PROMPT + 16) + 64
    bundle = EngineConfigBundle(
        model=model_cfg,
        cache=CacheConfig(block_size=128, num_gpu_blocks=0,
                          cache_max_entry_count=0.7,
                          quant_policy=QuantPolicy(kv_policy),
                          max_prefill_token_num=8192),
        scheduler=SchedulerConfig(max_batch_size=batch or BATCH,
                                  max_session_len=session_len,
                                  max_prefill_token_num=8192, max_prefill_batch=16),
        dist=DistConfig(),
        misc=MiscConfig(empty_init=True),
    )
    return Engine(None, TpuEngineConfig(), configs=bundle)


def device_identity():
    """device_kind + nominal peaks, so MFU/roofline claims are anchored."""
    import jax
    kind = jax.devices()[0].device_kind
    peaks = None
    for prefix, p in sorted(CHIP_PEAKS.items(), key=lambda kv: -len(kv[0])):
        if kind.startswith(prefix):
            peaks = p
            break
    out = {'device_kind': kind}
    if peaks:
        out['hbm_gbs_nominal'] = peaks['hbm_gbs']
        out['bf16_tflops_nominal'] = peaks['bf16_tflops']
    return out


async def run_round(eng, batch, seed, new_tokens):
    import asyncio

    import numpy as np
    from lmdeploy_tpu.messages import GenerationConfig

    rng = np.random.RandomState(seed)
    gen = GenerationConfig(max_new_tokens=new_tokens, ignore_eos=True)

    async def one(i):
        inst = eng.create_instance()
        prompt = rng.randint(10, 31000, size=PROMPT_LEN).tolist()
        out = await inst.async_infer(seed * 10000 + i, prompt, gen)
        await inst.async_end(seed * 10000 + i)
        return len(out.token_ids)

    t0 = time.perf_counter()
    counts = await asyncio.gather(*[one(i) for i in range(batch)])
    dt = time.perf_counter() - t0
    return sum(counts), dt


def _median(vals):
    vals = sorted(vals)
    return vals[len(vals) // 2] if vals else 0.0


async def decode_child(quant):
    import asyncio
    eng = build_engine(quant)
    res = {'tok_s': 0.0}
    # Cover EVERY decode-run bucket k, k/2, ..., 1: the prefill step samples
    # token 1, so 2k decode tokens walk exactly k + k/2 + ... + 1.  (Round-1
    # lesson: otherwise the k=1 tail compile lands inside the measured round.)
    warm_new = 2 * eng.model_agent.decode_run_steps
    warmup_timeout = float(os.environ.get('BENCH_WARMUP_TIMEOUT', '420'))
    round_timeout = float(os.environ.get('BENCH_ROUND_TIMEOUT', '300'))
    try:
        w_total, w_dt = await asyncio.wait_for(
            run_round(eng, BATCH, seed=1, new_tokens=warm_new), warmup_timeout)
    except asyncio.TimeoutError:
        res['note'] = 'device stalled during warmup'
        print(json.dumps(res), flush=True)
        os._exit(0)   # a wedged device call blocks the non-daemon step thread
    try:
        # median of BENCH_ROUNDS (full, short) pairs: a single noisy tunnel
        # round moved the r4 w4a16/bf16 ratio by +-15% (VERDICT r4 weak #2);
        # the decode-only rate is the two-point slope of each pair (the short
        # round shares the identical prefill cost, so the wall-time delta is
        # pure decode).
        mixed, slopes = [], []
        total = dt = 0
        for r in range(ROUNDS):
            total, dt = await asyncio.wait_for(
                run_round(eng, BATCH, seed=2 + 2 * r, new_tokens=NEW_TOKENS),
                round_timeout)
            mixed.append(total / dt)
            short_total, short_dt = await asyncio.wait_for(
                run_round(eng, BATCH, seed=3 + 2 * r,
                          new_tokens=max(NEW_TOKENS // 4, 1)),
                round_timeout)
            if dt > short_dt:
                slopes.append((total - short_total) / (dt - short_dt))
        res['tok_s'] = round(_median(mixed), 2)
        res['rounds'] = len(mixed)
        if slopes:
            res['decode_only_tok_s'] = round(_median(slopes), 2)
        # small-batch decode (bs=8): the regime the reference's W4A16
        # headline measures (w4a16.md:119 is single-batch on a 4090) — at
        # small batch decode is weight-streaming-bound and the 4-bit win
        # shows up undiluted by attention/sampling shares.  A fresh engine
        # with k=64 decode runs amortizes the tunnel's per-dispatch RTT
        # (~30 ms), which at bs8 otherwise dominates the 1 ms steps.
        import jax as _jax
        res['_wbytes'] = sum(x.nbytes for x in _jax.tree_util.tree_leaves(
            eng.model_agent.params))
        eng.close()
        # release the big KV cache before building the k=64 engine (its
        # block-count derivation reads free HBM)
        eng.model_agent.cache_engine.kv_cache = None
        eng.model_agent.decode_state = None
        os.environ['LMDEPLOY_TPU_DECODE_RUN'] = '64'
        try:
            eng8 = build_engine(quant)
            sb = 8
            await asyncio.wait_for(
                run_round(eng8, sb, seed=4,
                          new_tokens=2 * eng8.model_agent.decode_run_steps),
                warmup_timeout)
            t8, d8 = await asyncio.wait_for(
                run_round(eng8, sb, seed=5, new_tokens=256), round_timeout)
            t8s, d8s = await asyncio.wait_for(
                run_round(eng8, sb, seed=6, new_tokens=64), round_timeout)
            if d8 > d8s:
                res['bs8_decode_only_tok_s'] = round(
                    (t8 - t8s) / (d8 - d8s), 2)
        finally:
            os.environ.pop('LMDEPLOY_TPU_DECODE_RUN', None)
        if quant:
            res.pop('_wbytes', None)
    except asyncio.TimeoutError:
        if res['tok_s'] == 0.0:
            res['tok_s'] = round(w_total / w_dt, 2)
            res['note'] = 'measured round stalled; warmup-round rate'
        print(json.dumps(res), flush=True)
        os._exit(0)
    if quant == '':
        res.update(device_identity())
        # achieved HBM streaming rate vs a MEASURED roofline: each decode
        # step reads all weights plus the batch's KV pages.
        wbytes = res.pop('_wbytes')
        cfg = eng.configs.model
        avg_ctx = PROMPT_LEN + NEW_TOKENS / 2
        kv_bytes = (cfg.num_layers * 2 * cfg.num_key_value_heads
                    * cfg.head_dim * 2 * avg_ctx * BATCH)
        step_bytes = wbytes + kv_bytes
        rate = res.get('decode_only_tok_s') or res['tok_s']
        gbs = step_bytes * (rate / BATCH) / 1e9
        res['achieved_gbs'] = round(gbs, 1)
        hbm = _measure_hbm_gbs()
        if hbm:
            res['hbm_gbs_measured'] = round(hbm, 1)
            res['roofline_frac'] = round(gbs / hbm, 3)
    print(json.dumps(res), flush=True)
    os._exit(0)       # skip engine teardown; the process is the cleanup


def _measure_hbm_gbs():
    """Measured HBM stream bandwidth via two-point slope timing.

    A fori_loop of elementwise passes forces one read+write of the buffer per
    iteration (XLA cannot fuse across while-loop iterations); timing the delta
    between a 64- and a 16-iteration variant cancels the tunnel-RTT constant
    and the dispatch overhead that make single-shot timings useless here.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax
    try:
        x = jnp.ones((256 * 1024 * 1024,), jnp.bfloat16)   # 512 MB

        def passes(n):
            @jax.jit
            def f(x):
                # NB: the multiplier must not round to 1.0 in bf16 — XLA
                # simplifies x*1 to a no-op and the "measured" rate becomes
                # pure RTT (r3 recorded 115 TB/s this way).  1.0078125 is
                # exactly representable in bf16; 64 passes drift the values
                # by 1.6x without overflow.
                return lax.fori_loop(
                    0, n, lambda i, a: a * jnp.bfloat16(1.0078125), x)
            return f

        f16, f64 = passes(16), passes(64)
        for f in (f16, f64):          # compile + warm
            jax.device_get(f(x)[:1])
        rates = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.device_get(f16(x)[:1])
            t1 = time.perf_counter()
            jax.device_get(f64(x)[:1])
            t2 = time.perf_counter()
            d = (t2 - t1) - (t1 - t0)
            if d > 0:
                rates.append((64 - 16) * 2 * x.nbytes / d / 1e9)
        if not rates:
            return None
        rates.sort()
        return rates[len(rates) // 2]     # median: the tunnel jitters both ways
    except Exception:
        return None


async def llama7b_child():
    """llama2-7b geometry (BASELINE.md headline rows), W4A16 + KV-int8 —
    the BASELINE.json north-star serving config — decode throughput + TTFT.

    VERDICT r4 directive #2: TinyLlama-1.1B says nothing about 7B-class
    serving; this phase runs the real geometry (random weights; throughput
    is value-blind) with the quantized KV the north star names.
    """
    import asyncio

    import numpy as np
    from lmdeploy_tpu.messages import GenerationConfig

    batch = int(os.environ.get('BENCH_7B_BATCH', '64'))
    os.environ.setdefault('LMDEPLOY_TPU_DECODE_RUN', '32')
    eng = build_engine('w4a16', geometry='llama7b', kv_policy=4, batch=batch)
    res = {'tok_s': 0.0}
    warm_new = 2 * eng.model_agent.decode_run_steps
    warmup_timeout = float(os.environ.get('BENCH_WARMUP_TIMEOUT', '420'))
    round_timeout = float(os.environ.get('BENCH_ROUND_TIMEOUT', '300'))
    try:
        await asyncio.wait_for(
            run_round(eng, batch, seed=1, new_tokens=warm_new),
            warmup_timeout)
        mixed, slopes = [], []
        for r in range(ROUNDS):
            total, dt = await asyncio.wait_for(
                run_round(eng, batch, seed=2 + 2 * r, new_tokens=NEW_TOKENS),
                round_timeout)
            mixed.append(total / dt)
            st, sdt = await asyncio.wait_for(
                run_round(eng, batch, seed=3 + 2 * r,
                          new_tokens=max(NEW_TOKENS // 4, 1)), round_timeout)
            if dt > sdt:
                slopes.append((total - st) / (dt - sdt))
        res['tok_s'] = round(_median(mixed), 2)
        if slopes:
            res['decode_only_tok_s'] = round(_median(slopes), 2)
        # single-request TTFT on a 2048-token prompt (warm bucket first)
        gen = GenerationConfig(max_new_tokens=2, ignore_eos=True)
        rng = np.random.RandomState(11)

        async def first_tok(sid):
            inst = eng.create_instance()
            prompt = rng.randint(10, 31000, size=TTFT_PROMPT).tolist()
            t0 = time.perf_counter()
            async for _ in inst.async_stream_infer(sid, prompt, gen):
                ms = (time.perf_counter() - t0) * 1000.0
                break
            await inst.async_end(sid)
            return ms

        await asyncio.wait_for(first_tok(7001), warmup_timeout)   # warm
        lats = [await asyncio.wait_for(first_tok(7002 + i), round_timeout)
                for i in range(3)]
        res['ttft_ms'] = round(_median(lats), 1)
        res.update(device_identity())
    except asyncio.TimeoutError:
        res['note'] = 'stalled'
    print(json.dumps(res), flush=True)
    os._exit(0)


async def rps_child():
    """Request-throughput (RPS) under a ShareGPT-like length distribution.

    The reference's headline metric is RPS over 3000 ShareGPT prompts
    (benchmark/profile_throughput.py; a100_fp16.md:19 = 14.556 RPS for
    llama2-7b).  No dataset ships in this image, so lengths are sampled from
    a lognormal fit of ShareGPT (input med ~50 mean ~220, output med ~180),
    clipped to the session; all requests are submitted up front and the
    engine's continuous batching drains them (the reference harness does the
    same — concurrency is the scheduler's choice).
    """
    import asyncio

    import numpy as np
    from lmdeploy_tpu.messages import GenerationConfig

    n_req = int(os.environ.get('BENCH_RPS_REQUESTS', '128'))
    eng = build_engine('w4a16', kv_policy=4)
    # AOT-compile the decode-run lattice this workload walks: full-length
    # runs at every batch bucket (churn shrinks the batch 64 -> 1) plus the
    # k spectrum for the straggler tail.  These populate the persistent
    # compile cache without device execution; left to chance, each cold
    # (k, B) pair compiles INSIDE the measured window (~10-60 s apiece on
    # the tunnel).
    ma = eng.model_agent
    full_k = [ma.decode_run_steps]
    ma.warmup(batch_sizes=[b for b in (1, 2, 4, 8, 16, 32, 64)
                           if b <= ma.max_batch], decode_ks=full_k)
    ma.warmup(batch_sizes=[1, 2, 4])
    print('# rps AOT decode lattice warmed', file=sys.stderr, flush=True)
    rng = np.random.RandomState(13)
    in_lens = np.clip(rng.lognormal(4.5, 1.1, n_req).astype(int), 4, 1536)
    out_lens = np.clip(rng.lognormal(5.0, 0.9, n_req).astype(int), 4, 512)
    warmup_timeout = float(os.environ.get('BENCH_WARMUP_TIMEOUT', '900'))

    async def one(i, ilen=None, olen=None, base=3000):
        inst = eng.create_instance()
        prompt = rng.randint(
            10, 31000, size=int(ilen or in_lens[i])).tolist()
        gen = GenerationConfig(max_new_tokens=int(olen or out_lens[i]),
                               ignore_eos=True)
        out = await inst.async_infer(base + i, prompt, gen)
        await inst.async_end(base + i)
        return len(out.token_ids)

    res = {}
    try:
        # warmup sweeps the prefill-length bucket spectrum FIRST (each new
        # (batch, chunk) shape costs a multi-second XLA compile on the
        # tunnel; the length distribution otherwise hits them mid-measure),
        # then a mixed burst covers decode-run row buckets
        for ln in (16, 64, 256, 1024, 1536):
            await asyncio.wait_for(one(9000 + ln, ilen=ln, olen=8, base=0),
                                   warmup_timeout)
            print(f'# rps warmup len={ln} done', file=sys.stderr, flush=True)
        await asyncio.wait_for(
            asyncio.gather(*[one(i, base=8000) for i in range(16)]),
            warmup_timeout)
        print('# rps warmup burst done', file=sys.stderr, flush=True)
        # long-prompt burst: covers the WIDE overlap-prefill buckets
        # (max_prefill_batch rows x 8192-token chunks) that the length
        # distribution otherwise hits mid-measure — on a cold compile cache
        # one such bucket cost 175 s inside the measured window
        await asyncio.wait_for(
            asyncio.gather(*[one(i, ilen=1400, olen=8, base=7000)
                             for i in range(16)]),
            warmup_timeout)
        print('# rps warmup long burst done', file=sys.stderr, flush=True)
        # throwaway pass of the FULL workload (short outputs): whatever
        # residual (batch, chunk, k) shapes the distribution walks compile
        # here, not inside the measured pass
        await asyncio.wait_for(
            asyncio.gather(*[one(i, olen=min(24, int(out_lens[i])),
                                 base=5000) for i in range(n_req)]),
            warmup_timeout)
        print('# rps warmup dry pass done', file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        counts = await asyncio.wait_for(
            asyncio.gather(*[one(i) for i in range(n_req)]),
            float(os.environ.get('BENCH_RPS_TIMEOUT', '900')))
        dt = time.perf_counter() - t0
        res['rps'] = round(len(counts) / dt, 3)
        res['out_tok_s'] = round(sum(counts) / dt, 1)
        res['n_requests'] = len(counts)
        res['quant'] = 'w4a16+kv8'
    except asyncio.TimeoutError:
        res['note'] = 'stalled'
    print(json.dumps(res), flush=True)
    os._exit(0)


async def ttft_child():
    """p50/p99 time-to-first-token for a long prompt under concurrent load.

    Built at W4A16 — BASELINE.json's north star is "tok/s/chip + p50 TTFT at
    W4A16" (VERDICT r3 weak #3: earlier rounds measured TTFT on a bf16
    engine).  Also reports aggregate prefill throughput for the measured
    round (VERDICT r3 directive #2).
    """
    import asyncio

    import numpy as np
    from lmdeploy_tpu.messages import GenerationConfig

    quant = os.environ.get('BENCH_TTFT_QUANT', 'w4a16')
    eng = build_engine(quant)
    rng = np.random.RandomState(7)
    gen = GenerationConfig(max_new_tokens=4, ignore_eos=True)

    async def one(i, lat):
        inst = eng.create_instance()
        prompt = rng.randint(10, 31000, size=TTFT_PROMPT).tolist()
        t0 = time.perf_counter()
        async for _ in inst.async_stream_infer(9000 + i, prompt, gen):
            lat.append((time.perf_counter() - t0) * 1000.0)
            break
        await inst.async_end(9000 + i)

    try:
        # warm with the SAME concurrency as the measured round: 8 concurrent
        # prompts exercise the overlap-prefill dispatch + decode-run buckets
        # the measured round hits (a 2-request warmup left two executables to
        # compile inside the measured round: 2414 ms + 612 ms, most of the
        # r3/r4 TTFT regression)
        warm = []
        await asyncio.wait_for(
            asyncio.gather(*[one(i, warm) for i in range(TTFT_BATCH)]), 420)
        lat = []
        t0 = time.perf_counter()
        await asyncio.wait_for(
            asyncio.gather(*[one(100 + i, lat) for i in range(TTFT_BATCH)]), 420)
        round_dt = time.perf_counter() - t0
    except asyncio.TimeoutError:
        print(json.dumps({'p50_ms': -1.0, 'p99_ms': -1.0, 'quant': quant,
                          'note': 'stalled'}), flush=True)
        os._exit(0)
    lat.sort()
    p50 = lat[len(lat) // 2]
    p99 = lat[min(len(lat) - 1, int(len(lat) * 0.99))]
    out = {'p50_ms': round(p50, 1), 'p99_ms': round(p99, 1),
           'quant': quant,
           'prefill_tok_s': round(TTFT_BATCH * TTFT_PROMPT / round_dt, 1)}
    # cold-bucket TTFT: ONE prompt at a length whose dispatch buckets the
    # warmup never touched — the real p99 story for a JIT serving stack
    # (VERDICT r4 weak #7).  With LMDEPLOY_TPU_COMPILE_CACHE set and
    # populated, later engines skip this cliff.
    try:
        cold_len = int(os.environ.get('BENCH_TTFT_COLD_PROMPT',
                                      str(TTFT_PROMPT // 4 + 64)))
        cold = []

        async def one_cold():
            inst = eng.create_instance()
            prompt = rng.randint(10, 31000, size=cold_len).tolist()
            t0 = time.perf_counter()
            async for _ in inst.async_stream_infer(9900, prompt, gen):
                cold.append((time.perf_counter() - t0) * 1000.0)
                break
            await inst.async_end(9900)

        await asyncio.wait_for(one_cold(), 420)
        if cold:
            out['cold_ms'] = round(cold[0], 1)
            out['cold_prompt_len'] = cold_len
    except asyncio.TimeoutError:
        pass
    print(json.dumps(out), flush=True)
    os._exit(0)


def child_main(name):
    import asyncio
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    # persistent XLA compilation cache across phases/retries: cold dispatch
    # buckets (especially the RPS phase's length spectrum) otherwise pay a
    # fresh multi-second compile per (batch, chunk) shape every run
    os.environ.setdefault('LMDEPLOY_TPU_COMPILE_CACHE',
                          '/tmp/lmdeploy_tpu_xla_cache')
    if _FORCE_CPU:
        import jax
        jax.config.update('jax_platforms', 'cpu')
    if name == 'bf16':
        asyncio.run(decode_child(''))
    elif name == 'w4a16':
        asyncio.run(decode_child('w4a16'))
    elif name == 'ttft':
        asyncio.run(ttft_child())
    elif name == 'llama7b':
        asyncio.run(llama7b_child())
    elif name == 'rps':
        asyncio.run(rps_child())
    else:
        raise SystemExit(f'unknown child phase {name}')


if __name__ == '__main__':
    if len(sys.argv) >= 3 and sys.argv[1] == '--child':
        child_main(sys.argv[2])
    else:
        parent_main()
