"""Multi-host initialization over a TPU pod slice.

Reference analog: the reference's multi-node bootstrap (Ray cluster init
``pytorch/ray.py:96``, TurboMind TCPStore ``turbomind.py:142-153``).  On TPU the
entire control plane is ``jax.distributed``: every host runs the same program,
``jax.devices()`` spans the slice, and one Mesh covers all chips — the engine
code is unchanged between 1 chip and a v5e-256 slice.

Typical deployment (mirrors the reference's launch_server --nnodes):

    # on every host of the slice (TPU VMs auto-discover via the metadata server)
    python -c "from lmdeploy_tpu.parallel.multihost import init; init()" \
        && python -m lmdeploy_tpu serve api_server <model> --tp 16 ...

Requests are served by host 0's API server; other hosts run the same engine as
passive SPMD participants (jit executes collectively).  DP>1 deployments instead
run one engine per dp group behind serve/proxy.py.
"""
from __future__ import annotations

import os
from typing import Optional


def init(coordinator_address: Optional[str] = None,
         num_processes: Optional[int] = None,
         process_id: Optional[int] = None) -> dict:
    """Initialize jax.distributed; no-op on a single host.

    On GCP TPU VMs all arguments auto-discover; elsewhere pass them explicitly or
    set JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        'JAX_COORDINATOR_ADDRESS')
    num_processes = num_processes or _int_env('JAX_NUM_PROCESSES')
    process_id = process_id if process_id is not None else _int_env('JAX_PROCESS_ID')

    if num_processes in (None, 1) and coordinator_address is None:
        return {'process_id': 0, 'num_processes': 1,
                'local_devices': len(jax.local_devices()),
                'global_devices': len(jax.devices())}

    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return {'process_id': jax.process_index(),
            'num_processes': jax.process_count(),
            'local_devices': len(jax.local_devices()),
            'global_devices': len(jax.devices())}


def _int_env(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v else None


def is_primary() -> bool:
    import jax
    return jax.process_index() == 0
