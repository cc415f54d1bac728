"""Cluster proxy: routing strategies, health probing, retry/fault tolerance."""
import asyncio
import time

import pytest

from lmdeploy_tpu.serve.proxy import HEARTBEAT_EXPIRY, Node, NodeManager


def test_routing_strategies():
    nm = NodeManager('min_observed_latency')
    nm.add('http://a:1')
    nm.add('http://b:1')
    nm.nodes['http://a:1'].observe(0.5)
    nm.nodes['http://b:1'].observe(0.1)
    assert nm.pick().url == 'http://b:1'

    nm2 = NodeManager('min_expected_latency')
    nm2.add('http://a:1')
    nm2.add('http://b:1')
    nm2.nodes['http://a:1'].observe(0.1)
    nm2.nodes['http://b:1'].observe(0.1)
    nm2.nodes['http://a:1'].inflight = 5
    assert nm2.pick().url == 'http://b:1'


def test_heartbeat_expiry_and_exclude():
    nm = NodeManager('random')
    nm.add('http://a:1')
    nm.add('http://b:1')
    nm.nodes['http://a:1'].last_alive = time.time() - HEARTBEAT_EXPIRY - 1
    alive = nm.alive_nodes()
    assert [n.url for n in alive] == ['http://b:1']
    assert nm.pick(exclude={'http://b:1'}) is None
    nm.heartbeat('http://a:1')
    assert len(nm.alive_nodes()) == 2


def test_forward_retries_next_node(tmp_path):
    """A dead first-choice node must not fail the request; retry hits the live one."""
    from aiohttp import web
    from aiohttp.test_utils import TestClient, TestServer

    from lmdeploy_tpu.serve.proxy import create_proxy_app

    loop = asyncio.new_event_loop()

    async def run():
        # a tiny live backend
        backend = web.Application()

        async def ok(request):
            return web.json_response({'from': 'live-backend'})

        backend.router.add_post('/v1/chat/completions', ok)
        backend.router.add_get('/health', ok)
        bc = TestClient(TestServer(backend))
        await bc.start_server()
        backend_url = f'http://127.0.0.1:{bc.port}'

        app = create_proxy_app(routing_strategy='min_observed_latency')
        manager = app['node_manager']
        manager.add('http://127.0.0.1:1')        # dead node (refused)
        manager.add(backend_url)
        # make the dead node the preferred pick
        manager.nodes['http://127.0.0.1:1'].observe(0.001)
        manager.nodes[backend_url].observe(1.0)
        pc = TestClient(TestServer(app))
        await pc.start_server()
        try:
            r = await pc.post('/v1/chat/completions', json={'x': 1})
            data = await r.json()
            assert data == {'from': 'live-backend'}
            assert manager.nodes['http://127.0.0.1:1'].failures == 1
        finally:
            await pc.close()
            await bc.close()
        return True

    try:
        assert loop.run_until_complete(run())
    finally:
        loop.close()
