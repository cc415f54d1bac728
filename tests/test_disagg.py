"""PD disaggregation: KV migration between a prefill engine and a decode engine.

The continuation produced after migration must equal the single-engine greedy
generation — i.e. the migrated KV blocks are byte-faithful and the decode engine
resumes mid-sequence with no recompute.
"""
import asyncio

import numpy as np
import pytest


def _make_engine(model_dir, role):
    from lmdeploy_tpu.engine.engine import Engine
    from lmdeploy_tpu.messages import TpuEngineConfig
    cfg = TpuEngineConfig(dtype='float32', block_size=16, num_gpu_blocks=48,
                          max_batch_size=4, session_len=160,
                          max_prefill_token_num=64, role=role)
    return Engine.from_pretrained(model_dir, cfg)


def _gen(eng, session_id, prompt, n, end=True):
    from lmdeploy_tpu.messages import GenerationConfig

    async def run():
        inst = eng.create_instance()
        out = await inst.async_infer(session_id, prompt,
                                     GenerationConfig(max_new_tokens=n,
                                                      ignore_eos=True))
        if end:
            await inst.async_end(session_id)
        return out.token_ids

    loop = asyncio.new_event_loop()
    try:
        return loop.run_until_complete(run())
    finally:
        loop.close()


def test_pd_migration_matches_single_engine(tiny_model_dir):
    from lmdeploy_tpu import disagg
    from lmdeploy_tpu.messages import ResponseType
    from lmdeploy_tpu.paging.seq import SamplingParams

    prompt = [1, 17, 42, 99, 7, 23, 55, 12, 3, 81]

    # ground truth: one hybrid engine, 9 tokens
    hybrid = _make_engine(tiny_model_dir, 'hybrid')
    try:
        full = _gen(hybrid, 1, prompt, 9)
    finally:
        hybrid.close()

    # prefill engine: first token only; role retains blocks after finish
    pre = _make_engine(tiny_model_dir, 'prefill')
    try:
        first = _gen(pre, 7, prompt, 1, end=False)
        assert first == full[:1]
        payload = disagg.export_session_kv(pre, 7)
        assert payload['kv_leaf_0'].shape[1] >= 1
        wire = disagg.serialize_payload(payload)
        disagg.release_exported(pre, 7)
        assert not pre.scheduler.has_unfinished()
    finally:
        pre.close()

    # decode engine: import + continue the remaining 8 tokens
    dec = _make_engine(tiny_model_dir, 'decode')
    try:
        payload2 = disagg.deserialize_payload(wire)
        sp = SamplingParams(max_new_tokens=8, ignore_eos=True)

        async def run():
            disagg.import_session_kv(dec, 7, payload2, sp)
            queue = dec.continue_session(7)
            out = None
            while True:
                out = await queue.get()
                if out.status != ResponseType.SUCCESS:
                    break
            return out.token_ids

        loop = asyncio.new_event_loop()
        try:
            cont = loop.run_until_complete(run())
        finally:
            loop.close()
        assert cont == full[1:], (cont, full)
    finally:
        dec.close()


def test_pd_http_endpoints(tiny_model_dir):
    """Wire-level migration via /distserve endpoints between two live servers."""
    from aiohttp.test_utils import TestClient, TestServer

    from lmdeploy_tpu.messages import TpuEngineConfig
    from lmdeploy_tpu.serve.api_server import create_app
    from lmdeploy_tpu.serve.async_engine import AsyncEngine

    loop = asyncio.new_event_loop()
    cfg_p = TpuEngineConfig(dtype='float32', block_size=16, num_gpu_blocks=48,
                            max_batch_size=4, session_len=160,
                            max_prefill_token_num=64, role='prefill')
    cfg_d = TpuEngineConfig(dtype='float32', block_size=16, num_gpu_blocks=48,
                            max_batch_size=4, session_len=160,
                            max_prefill_token_num=64, role='decode')
    pre = AsyncEngine(tiny_model_dir, backend_config=cfg_p)
    dec = AsyncEngine(tiny_model_dir, backend_config=cfg_d)

    async def run():
        cp = TestClient(TestServer(create_app(pre, 'pre')))
        cd = TestClient(TestServer(create_app(dec, 'dec')))
        await cp.start_server()
        await cd.start_server()
        try:
            r = await cp.post('/generate', json={
                'input_ids': [5, 9, 13, 21, 30], 'max_tokens': 1,
                'ignore_eos': True, 'session_id': 3})
            first = (await r.json())['token_ids']
            assert len(first) == 1
            # NB: /generate ends the session, but prefill role retains the blocks
            r = await cp.get('/distserve/export/3')
            blob = await r.read()
            r = await cd.post('/distserve/import?session_id=3&max_new_tokens=4',
                              data=blob)
            assert (await r.json())['status'] == 'ok'
            r = await cd.post('/distserve/continue?session_id=3')
            body = (await r.read()).decode()
            assert 'token_ids' in body and '[DONE]' in body
        finally:
            await cp.close()
            await cd.close()
        return True

    try:
        assert loop.run_until_complete(run())
    finally:
        pre.close()
        dec.close()
        loop.close()


def test_pd_migration_quantized_cache(tiny_model_dir):
    """Quantized (int8 per-token) KV caches migrate too: the pytree's scale
    planes ride along as extra leaves and the continuation matches the
    single-engine run token-for-token."""
    from lmdeploy_tpu import disagg
    from lmdeploy_tpu.engine.engine import Engine
    from lmdeploy_tpu.messages import TpuEngineConfig
    from lmdeploy_tpu.paging.seq import SamplingParams

    def make(role):
        cfg = TpuEngineConfig(dtype='float32', block_size=16, num_gpu_blocks=48,
                              max_batch_size=4, session_len=160,
                              max_prefill_token_num=64, role=role,
                              quant_policy=4)
        return Engine.from_pretrained(tiny_model_dir, cfg)

    prompt = [2, 11, 29, 47, 83, 5, 19]

    hybrid = make('hybrid')
    try:
        full = _gen(hybrid, 1, prompt, 7)
    finally:
        hybrid.close()

    pre = make('prefill')
    try:
        first = _gen(pre, 7, prompt, 1, end=False)
        assert first == full[:1]
        payload = disagg.export_session_kv(pre, 7)
        assert int(payload['num_leaves']) == 2      # int8 pages + scales
        disagg.release_exported(pre, 7)
    finally:
        pre.close()

    from lmdeploy_tpu.messages import ResponseType
    dec = make('decode')
    try:
        sp = SamplingParams(max_new_tokens=6, ignore_eos=True)

        async def run():
            disagg.import_session_kv(dec, 7, payload, sp)
            queue = dec.continue_session(7)
            out = None
            while True:
                out = await queue.get()
                if out.status != ResponseType.SUCCESS:
                    break
            return out.token_ids

        loop = asyncio.new_event_loop()
        try:
            rest = loop.run_until_complete(run())
        finally:
            loop.close()
    finally:
        dec.close()
    assert first + rest == full, (first + rest, full)
