"""Expert-parallel load balancing (EPLB).

Reference analog: ``lmdeploy/pytorch/nn/eplb.py`` (DeepSeek's released EPLB:
replicate hot experts into redundant physical slots, then pack slots onto EP
ranks so per-rank load equalizes) and its EPLBManager (periodic rebalance from
dispatcher load counters, weight redistribution).

TPU-native shape of the idea: expert weights live as stacked arrays
``[L, S, H, I]`` whose leading expert axis is sharded over the 'ep' mesh axis,
so "assigning a physical slot to a rank" is just *where along the expert axis
the slot sits* — GSPMD places slots ``[r*S/ep, (r+1)*S/ep)`` on rank r.  A
rebalance is therefore a permutation (+ duplication) of rows of the expert
stacks plus two small per-layer lookup tables that map the router's LOGICAL
choices to physical slots at runtime (``ops/moe.py eplb_remap``).  Replicas of
a hot expert are spread across tokens round-robin, splitting its load.

Load statistics come from the serving side (e.g. offline profiling of a
representative corpus, or the reference's dispatcher counters); the algorithm
takes a measured ``[L, E]`` load matrix.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np


def rebalance_experts(load: np.ndarray, num_physical: int, num_ranks: int = 1,
                      ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Balanced replication + packing for ONE layer.

    Args:
      load:         [E] non-negative expert load (token counts).
      num_physical: S >= E total physical slots (S - E redundant replicas).
      num_ranks:    EP ranks; S must divide evenly by it.

    Returns (phys_to_logical [S], logical_to_phys [E, Rmax], replicas [E]):
      * ``phys_to_logical[s]`` — which logical expert slot ``s`` holds, laid
        out rank-major (slots of rank r occupy s in [r*S/ranks, (r+1)*S/ranks)).
      * ``logical_to_phys[e, i]`` — the i-th physical replica of expert e
        (rows padded by repeating the first replica).
      * ``replicas[e]`` — replica count per expert.
    """
    E = int(load.shape[0])
    S = int(num_physical)
    assert S >= E, 'every expert needs at least one physical slot'
    assert S % num_ranks == 0, 'slots must split evenly across EP ranks'
    load = np.asarray(load, np.float64) + 1e-9

    # 1. replication: each redundant slot goes to the expert whose per-replica
    #    load is currently highest (greedy; optimal for minimizing the max)
    replicas = np.ones(E, np.int64)
    for _ in range(S - E):
        replicas[np.argmax(load / replicas)] += 1

    # 2. physical slots, each carrying load[e] / replicas[e]
    slot_expert = np.repeat(np.arange(E), replicas)            # [S]
    slot_load = (load / replicas)[slot_expert]

    # 3. LPT packing: heaviest slot first onto the least-loaded rank that
    #    still has capacity (S / num_ranks slots per rank)
    cap = S // num_ranks
    rank_load = np.zeros(num_ranks, np.float64)
    rank_fill = np.zeros(num_ranks, np.int64)
    assign = np.zeros(S, np.int64)
    for s in np.argsort(-slot_load):
        open_ranks = np.nonzero(rank_fill < cap)[0]
        r = open_ranks[np.argmin(rank_load[open_ranks])]
        assign[s] = r
        rank_load[r] += slot_load[s]
        rank_fill[r] += 1

    # 4. rank-major physical order
    order = np.argsort(assign, kind='stable')
    phys_to_logical = slot_expert[order].astype(np.int32)

    rmax = int(replicas.max())
    logical_to_phys = np.zeros((E, rmax), np.int32)
    for e in range(E):
        phys = np.nonzero(phys_to_logical == e)[0]
        pad = np.concatenate([phys, np.repeat(phys[:1], rmax - len(phys))])
        logical_to_phys[e] = pad
    return phys_to_logical, logical_to_phys, replicas.astype(np.int32)


def install_eplb(layer_params: dict, load: np.ndarray, num_physical: int,
                 num_ranks: int = 1,
                 expert_keys=('we_gate', 'we_up', 'we_down')) -> dict:
    """Return a new per-layer param dict with EPLB-laid-out expert stacks.

    ``layer_params`` is a params['layers']-style dict whose expert stacks are
    ``[L, E, ...]``; ``load`` is [L, E].  Adds ``eplb_l2p`` [L, E, Rmax] and
    ``eplb_reps`` [L, E] lookup tables consumed by ``ops/moe.py eplb_remap``.
    Router weights/biases stay logical — only the dispatch is remapped.
    """
    import jax.numpy as jnp

    first = layer_params[expert_keys[0]]
    if isinstance(first, dict):
        first = next(iter(first.values()))
    L, E = first.shape[0], first.shape[1]
    load = np.broadcast_to(np.asarray(load, np.float64), (L, E))

    p2l = np.zeros((L, num_physical), np.int32)
    reps = np.zeros((L, E), np.int32)
    l2p_rows = []
    for l in range(L):
        p, l2p, r = rebalance_experts(load[l], num_physical, num_ranks)
        p2l[l] = p
        reps[l] = r
        l2p_rows.append(l2p)
    rmax = max(x.shape[1] for x in l2p_rows)
    l2p = np.zeros((L, E, rmax), np.int32)
    for l, x in enumerate(l2p_rows):
        l2p[l, :, :x.shape[1]] = x
        if x.shape[1] < rmax:   # pad extra replica columns with the first
            l2p[l, :, x.shape[1]:] = x[:, :1]

    out = dict(layer_params)
    idx = jnp.asarray(p2l)

    def relay(stack):                             # [L, E, ...] -> [L, S, ...]
        return jnp.take_along_axis(
            stack, idx.reshape(L, num_physical,
                               *([1] * (stack.ndim - 2))), axis=1)

    for key in expert_keys:
        stack = layer_params[key]
        if isinstance(stack, dict):               # quantized expert leaves
            out[key] = {k: relay(v) for k, v in stack.items()}
        else:
            out[key] = relay(stack)
    out['eplb_l2p'] = jnp.asarray(l2p)
    out['eplb_reps'] = jnp.asarray(np.maximum(reps, 1))
    return out
