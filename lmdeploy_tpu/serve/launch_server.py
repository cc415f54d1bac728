"""Multi-server launcher: N dp-rank API servers behind a built-in proxy.

Reference analog: ``lmdeploy/serve/openai/launch_server.py:104`` — spawns one
api_server per dp rank per node, with the proxy on rank 0.  Here each rank is a
subprocess running the aiohttp server; the proxy registers them and balances with
the configured routing strategy.  Multi-host pods additionally set
JAX coordinator env vars per rank (jax.distributed) — single-host multi-process
shown here; each subprocess claims its own chip set via JAX device visibility.
"""
from __future__ import annotations

import os
import signal
import subprocess
import sys
from typing import List, Optional


def launch_server(model_path: str, num_ranks: int = 1, base_port: int = 23334,
                  proxy_port: int = 8000,
                  routing_strategy: str = 'min_expected_latency',
                  extra_args: Optional[List[str]] = None,
                  wait: bool = True,
                  nnodes: int = 1, node_rank: int = 0,
                  coordinator: Optional[str] = None,
                  proxy_url: Optional[str] = None):
    """Spawn ``num_ranks`` API servers + a proxy; returns (procs, manager).

    Multi-node (reference launch_server.py --nnodes/--node-rank): every node
    runs the same command with its own ``node_rank``; rank servers get
    ``LMDEPLOY_TPU_COORDINATOR``/``NNODES``/``NODE_RANK`` so their engines
    join one jax.distributed job (parallel/multihost.init), and non-zero
    nodes REGISTER with node 0's proxy (``proxy_url``) instead of starting
    their own."""
    procs: List[subprocess.Popen] = []
    for rank in range(num_ranks):
        port = base_port + rank
        cmd = [sys.executable, '-m', 'lmdeploy_tpu', 'serve', 'api_server',
               model_path, '--server-port', str(port),
               '--server-name', '127.0.0.1'] + list(extra_args or [])
        env = dict(os.environ,
                   LMDEPLOY_TPU_DP_RANK=str(node_rank * num_ranks + rank))
        if nnodes > 1:
            env.update(LMDEPLOY_TPU_COORDINATOR=coordinator or '',
                       LMDEPLOY_TPU_NNODES=str(nnodes),
                       LMDEPLOY_TPU_NODE_RANK=str(node_rank))
        procs.append(subprocess.Popen(cmd, env=env))

    if node_rank > 0:
        # worker node: register this node's servers with the head proxy
        import json as _json
        import urllib.request
        for rank in range(num_ranks):
            url = f'{proxy_url}/nodes/add'
            body = _json.dumps({'url': f'http://127.0.0.1:{base_port + rank}',
                                'models': [model_path]}).encode()
            req = urllib.request.Request(
                url, data=body, headers={'Content-Type': 'application/json'})
            try:
                urllib.request.urlopen(req, timeout=10)
            except Exception as e:  # noqa: BLE001
                print(f'proxy registration failed for rank {rank}: {e}',
                      file=sys.stderr)
        if wait:
            for p in procs:
                p.wait()
        return procs, None

    from .proxy import NodeManager, create_proxy_app
    manager = NodeManager(routing_strategy)
    for rank in range(num_ranks):
        manager.add(f'http://127.0.0.1:{base_port + rank}', [model_path])

    def _shutdown(*_):
        for p in procs:
            p.terminate()
        raise SystemExit(0)

    if wait:
        from aiohttp import web
        signal.signal(signal.SIGTERM, _shutdown)
        try:
            web.run_app(create_proxy_app(manager), host='0.0.0.0',
                        port=proxy_port)
        finally:
            for p in procs:
                p.terminate()
    return procs, manager
