"""Multi-host reality check: the REAL Engine runs SPMD across two
jax.distributed processes (CPU + gloo collectives), tp=2 over the global
2-device mesh, and produces bit-identical greedy output on every rank —
and identical to the single-process engine.

Reference analog: multi-node serving via TurboMind's TCPStore bootstrap
(``lmdeploy/turbomind/turbomind.py:142-153``) / ``launch_server.py --nnodes``.
The TPU translation (``parallel/multihost.py``): every host runs the same
engine loop; jit executes collectively over one global mesh.
"""
import json
import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

PROMPT = list(range(3, 20))
NUM_NEW = 16

WORKER = textwrap.dedent('''
    import sys, json
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_cpu_collectives_implementation', 'gloo')
    rank, port, model_dir, out_path = (int(sys.argv[1]), sys.argv[2],
                                       sys.argv[3], sys.argv[4])
    from lmdeploy_tpu.parallel import multihost
    info = multihost.init(coordinator_address=f'127.0.0.1:{port}',
                          num_processes=2, process_id=rank)
    assert info['num_processes'] == 2 and info['global_devices'] == 2, info
    import asyncio
    from lmdeploy_tpu.engine.engine import Engine
    from lmdeploy_tpu.messages import TpuEngineConfig, GenerationConfig
    cfg = TpuEngineConfig(dtype='float32', block_size=16, num_gpu_blocks=64,
                          max_batch_size=8, session_len=256,
                          max_prefill_token_num=64, tp=2)
    eng = Engine.from_pretrained(model_dir, cfg)
    async def run():
        inst = eng.create_instance()
        out = await inst.async_infer(
            1, %r, GenerationConfig(max_new_tokens=%d, ignore_eos=True))
        await inst.async_end(1)
        return out
    loop = asyncio.new_event_loop()
    out = loop.run_until_complete(run())
    with open(out_path, 'w') as f:
        json.dump({'rank': rank, 'primary': multihost.is_primary(),
                   'tokens': list(map(int, out.token_ids))}, f)
    eng.close()
''' % (PROMPT, NUM_NEW))


@pytest.mark.timeout(600)
def test_engine_spmd_across_two_processes(tiny_model_dir, tmp_path):
    worker_py = tmp_path / 'worker.py'
    worker_py.write_text(WORKER)
    port = 29000 + (os.getpid() % 1000)
    env = dict(os.environ, PYTHONPATH=os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    env.pop('JAX_PLATFORMS', None)
    env.pop('XLA_FLAGS', None)   # conftest's 8-device override: 1 dev/proc here
    outs = [str(tmp_path / f'out{r}.json') for r in (0, 1)]
    procs = [subprocess.Popen(
        [sys.executable, str(worker_py), str(r), str(port), tiny_model_dir,
         outs[r]], env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for r in (0, 1)]
    logs = [p.communicate(timeout=540)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f'worker failed:\n{log[-3000:]}'
    results = [json.load(open(o)) for o in outs]
    assert results[0]['tokens'] == results[1]['tokens']
    assert results[0]['primary'] and not results[1]['primary']

    # must equal the single-process engine's greedy output
    import jax
    from lmdeploy_tpu.engine.engine import Engine
    from lmdeploy_tpu.messages import TpuEngineConfig
    sys.path.insert(0, os.path.dirname(__file__))
    from test_engine_e2e import generate_ids
    cfg = TpuEngineConfig(dtype='float32', block_size=16, num_gpu_blocks=64,
                          max_batch_size=8, session_len=256,
                          max_prefill_token_num=64)
    eng = Engine.from_pretrained(tiny_model_dir, cfg)
    try:
        ref = generate_ids(eng, 1, PROMPT, max_new=NUM_NEW)
        assert list(ref.token_ids) == results[0]['tokens']
    finally:
        eng.close()
