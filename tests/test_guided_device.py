"""Speculative grammar acceptance: guided rows ride device decode runs.

VERDICT r3 weak #5: guided/bad-words rows collapsed decode to per-step host
dispatches.  Greedy guided rows now run UNMASKED inside the k-step decode runs;
the drain accepts the longest PDA-legal prefix and one masked host step
recovers from a rejection — token-identical to per-step masking for greedy
sampling (argmax legal -> same token; argmax illegal -> the recovery step picks
the masked argmax, exactly what the host path picks).
Reference analog: lmdeploy/pytorch/engine/logits_process.py in-step bitmask."""
import asyncio
import os
import time

import pytest


def _engine(tiny_model_dir, max_batch=16):
    from lmdeploy_tpu.engine.engine import Engine
    from lmdeploy_tpu.messages import TpuEngineConfig
    from lmdeploy_tpu.tokenizer import Tokenizer
    cfg = TpuEngineConfig(dtype='float32', block_size=16, num_gpu_blocks=96,
                          max_batch_size=max_batch, session_len=160,
                          max_prefill_token_num=64)
    tok = Tokenizer(tiny_model_dir)
    return Engine.from_pretrained(tiny_model_dir, cfg, tokenizer=tok), tok


def _run(eng, tok, n_req, max_new, fmt):
    from lmdeploy_tpu.messages import GenerationConfig
    gen = GenerationConfig(max_new_tokens=max_new, ignore_eos=False,
                           response_format=fmt)

    async def one(i):
        inst = eng.create_instance()
        out = await inst.async_infer(500 + i, tok.encode('emit json:'), gen)
        await inst.async_end(500 + i)
        return list(out.token_ids)

    async def main():
        return await asyncio.gather(*[one(i) for i in range(n_req)])

    t0 = time.perf_counter()
    outs = asyncio.run(main())
    return outs, time.perf_counter() - t0


def test_guided_device_token_identical(tiny_model_dir):
    """Greedy guided outputs identical with and without the device path."""
    fmt = {'type': 'json_object'}
    eng, tok = _engine(tiny_model_dir)
    try:
        on, _ = _run(eng, tok, 4, 24, fmt)
    finally:
        eng.close()
    os.environ['LMDEPLOY_TPU_GUIDED_SPEC'] = '0'
    try:
        eng, tok = _engine(tiny_model_dir)
        off, _ = _run(eng, tok, 4, 24, fmt)
        eng.close()
    finally:
        os.environ.pop('LMDEPLOY_TPU_GUIDED_SPEC', None)
    assert on == off


def test_guided_device_output_is_json_prefix(tiny_model_dir):
    """Every output must be a valid JSON prefix per a fresh PDA replay."""
    fmt = {'type': 'json_object'}
    eng, tok = _engine(tiny_model_dir)
    try:
        outs, _ = _run(eng, tok, 2, 16, fmt)
        from lmdeploy_tpu.guided import JsonGuide
        for ids in outs:
            g = JsonGuide(tok, eng.configs.model.vocab_size,
                          eng.configs.model.eos_token_id)
            for t in ids:
                assert g.accept_token(int(t)), (ids, t)
    finally:
        eng.close()


def test_guided_device_throughput(tiny_model_dir):
    """8 guided requests within 2x the wall of 8 unguided (VERDICT done
    criterion) — the old host path ran one engine dispatch per token.

    Grammar = accept-everything regex, so acceptance is total and the guided
    rows genuinely stay inside the k-step device runs (a grammar the model's
    argmax constantly violates degrades to the masked host path by design —
    the acceptance-EMA demotion — which is the old behavior, not a
    regression)."""
    fmt = {'type': 'regex_schema', 'regex_schema': '(.|\n)*'}
    eng, tok = _engine(tiny_model_dir)
    try:
        # warm at the MEASURED shapes (prefill n=4 bucket, decode rows 4/8,
        # k=16 runs): the engine compiles buckets lazily, so a smaller warmup
        # left the first measured path eating multi-hundred-ms XLA compiles —
        # which measured compile placement, not guided overhead
        _run(eng, tok, 8, 32, fmt)     # warm guided executables + masks
        _run(eng, tok, 8, 32, None)    # warm plain executables
        _, t_guided = _run(eng, tok, 8, 32, fmt)
        _, t_plain = _run(eng, tok, 8, 32, None)
    finally:
        eng.close()
    assert t_guided <= 2.0 * t_plain + 0.5, (t_guided, t_plain)


# Low-acceptance demotion (json_object against random weights rejects most
# argmaxes) is exercised by test_guided_device_token_identical: the rows pass
# through rejection -> recovery -> EMA demotion and must still match the pure
# host path token-for-token.
