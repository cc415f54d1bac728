"""Proxy-orchestrated PD disaggregation: clients hit /v1/* on the proxy; the
proxy drives prefill -> KV migration -> decode across role-split engines.

Reference analog: ``lmdeploy/serve/proxy/proxy.py:654-733`` (ServingStrategy
DistServe: prefill request with max_tokens=1 + preserve_cache, decode request
with an attached MigrationRequest).  Here the proxy POSTs /distserve/prefill
on the prefill engine, then /distserve/decode on the decode engine, which
pulls the KV blob over DCN and streams a plain OpenAI response back.
"""
import asyncio

import pytest

from lmdeploy_tpu.messages import TpuEngineConfig
from lmdeploy_tpu.serve.api_server import create_app
from lmdeploy_tpu.serve.async_engine import AsyncEngine
from lmdeploy_tpu.serve.proxy import NodeManager, create_proxy_app


def _cfg(role):
    return TpuEngineConfig(dtype='float32', block_size=16, num_gpu_blocks=48,
                           max_batch_size=4, session_len=160,
                           max_prefill_token_num=64, role=role)


def test_node_role_pick():
    nm = NodeManager('random', 'distserve')
    nm.add('http://p:1', role='prefill')
    nm.add('http://d:1', role='decode')
    nm.add('http://h:1', role='hybrid')
    assert nm.pick(role='prefill').url == 'http://p:1'
    assert nm.pick(role='decode').url == 'http://d:1'
    # only the DECODE role may fall back to hybrid nodes: a hybrid engine
    # frees stopped sequences' KV in its step loop, so a prefill leg routed
    # to one races /distserve/export against block reuse (the caller serves
    # the request as a plain hybrid forward instead)
    nm2 = NodeManager('random', 'distserve')
    nm2.add('http://h:1', role='hybrid')
    assert nm2.pick(role='prefill') is None
    assert nm2.pick(role='decode').url == 'http://h:1'


@pytest.mark.parametrize('stream', [False, True])
def test_proxy_distserve_completions(tiny_model_dir, stream):
    """Greedy /v1/completions through the distserve proxy must match a single
    hybrid engine's output exactly (the migration is lossless)."""
    from aiohttp.test_utils import TestClient, TestServer

    loop = asyncio.new_event_loop()
    pre = AsyncEngine(tiny_model_dir, backend_config=_cfg('prefill'))
    dec = AsyncEngine(tiny_model_dir, backend_config=_cfg('decode'))
    hyb = AsyncEngine(tiny_model_dir, backend_config=_cfg('hybrid'))

    body = {'model': 'tiny', 'prompt': 'hello world this is',
            'max_tokens': 8, 'temperature': 0.0, 'stream': stream}

    async def run():
        cp = TestClient(TestServer(create_app(pre, 'tiny')))
        cd = TestClient(TestServer(create_app(dec, 'tiny')))
        ch = TestClient(TestServer(create_app(hyb, 'tiny')))
        await cp.start_server()
        await cd.start_server()
        await ch.start_server()
        manager = NodeManager('random', 'distserve')
        manager.add(f'http://127.0.0.1:{cp.port}', role='prefill')
        manager.add(f'http://127.0.0.1:{cd.port}', role='decode')
        cx = TestClient(TestServer(create_proxy_app(manager)))
        await cx.start_server()
        try:
            async def read_text(client, b):
                r = await client.post('/v1/completions', json=b)
                assert r.status == 200, await r.text()
                if b['stream']:
                    import json as _json
                    text = ''
                    raw = (await r.read()).decode()
                    for line in raw.splitlines():
                        if line.startswith('data: ') and '[DONE]' not in line:
                            d = _json.loads(line[len('data: '):])
                            text += d['choices'][0]['text']
                    return text
                d = await r.json()
                return d['choices'][0]['text']

            pd_text = await read_text(cx, body)
            ref_text = await read_text(ch, dict(body, stream=False))
            assert pd_text == ref_text and len(pd_text) > 0
            # prefill node released its session after the export
            assert not pre.engine.scheduler.has_unfinished()
        finally:
            await cx.close()
            await cp.close()
            await cd.close()
            await ch.close()
        return True

    try:
        assert loop.run_until_complete(run())
    finally:
        pre.close()
        dec.close()
        hyb.close()
        loop.close()


def test_proxy_distserve_chat(tiny_model_dir):
    """Chat completions through the distserve proxy: template applied on the
    prefill node, OpenAI chat response composed on the decode node."""
    from aiohttp.test_utils import TestClient, TestServer

    loop = asyncio.new_event_loop()
    pre = AsyncEngine(tiny_model_dir, backend_config=_cfg('prefill'))
    dec = AsyncEngine(tiny_model_dir, backend_config=_cfg('decode'))
    hyb = AsyncEngine(tiny_model_dir, backend_config=_cfg('hybrid'))

    body = {'model': 'tiny',
            'messages': [{'role': 'user', 'content': 'hello world'}],
            'max_tokens': 6, 'temperature': 0.0}

    async def run():
        cp = TestClient(TestServer(create_app(pre, 'tiny')))
        cd = TestClient(TestServer(create_app(dec, 'tiny')))
        ch = TestClient(TestServer(create_app(hyb, 'tiny')))
        await cp.start_server()
        await cd.start_server()
        await ch.start_server()
        manager = NodeManager('random', 'distserve')
        manager.add(f'http://127.0.0.1:{cp.port}', role='prefill')
        manager.add(f'http://127.0.0.1:{cd.port}', role='decode')
        cx = TestClient(TestServer(create_proxy_app(manager)))
        await cx.start_server()
        try:
            r = await cx.post('/v1/chat/completions', json=body)
            assert r.status == 200, await r.text()
            pd = await r.json()
            r = await ch.post('/v1/chat/completions', json=body)
            ref = await r.json()
            assert (pd['choices'][0]['message']['content']
                    == ref['choices'][0]['message']['content'])
            assert pd['usage']['completion_tokens'] >= 1
        finally:
            await cx.close()
            await cp.close()
            await cd.close()
            await ch.close()
        return True

    try:
        assert loop.run_until_complete(run())
    finally:
        pre.close()
        dec.close()
        hyb.close()
        loop.close()
