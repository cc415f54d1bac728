"""LoRA adapter loading (HF/PEFT checkpoints), merge-based application.

Reference analog: ``lmdeploy/pytorch/adapter/adapter.py`` (S-LoRA-style manager).
Round-1 semantics: one active adapter per engine, applied by merging
``scaling * B @ A`` into the base weights on device (and subtracted on unload) —
zero runtime overhead, instant swap.  Per-request adapter multiplexing (true
S-LoRA rank slicing) extends the same storage in a later round.

PEFT tensor naming handled:
  base_model.model.model.layers.{i}.self_attn.q_proj.lora_A.weight   [r, H]
  base_model.model.model.layers.{i}.self_attn.q_proj.lora_B.weight   [out, r]
"""
from __future__ import annotations

import json
import os
import re
from typing import Dict, Optional, Tuple

import numpy as np

_HF_TO_NATIVE = {
    'self_attn.q_proj': 'wq', 'self_attn.k_proj': 'wk', 'self_attn.v_proj': 'wv',
    'self_attn.o_proj': 'wo', 'mlp.gate_proj': 'w_gate', 'mlp.up_proj': 'w_up',
    'mlp.down_proj': 'w_down',
}
_KEY_RE = re.compile(
    r'model\.layers\.(\d+)\.([a-z_]+\.[a-z_]+proj)\.lora_(A|B)\.weight')


def load_peft_adapter(path: str) -> Tuple[Dict[str, Dict[int, Dict[str, np.ndarray]]],
                                          float]:
    """Read a PEFT checkpoint -> {native_module: {layer: {'A','B'}}}, scaling."""
    from safetensors import safe_open

    cfg_path = os.path.join(path, 'adapter_config.json')
    with open(cfg_path) as f:
        cfg = json.load(f)
    r = cfg['r']
    alpha = cfg.get('lora_alpha', r)
    scaling = alpha / r

    weights: Dict[str, Dict[int, Dict[str, np.ndarray]]] = {}
    st = os.path.join(path, 'adapter_model.safetensors')
    with safe_open(st, framework='np') as f:
        for name in f.keys():
            m = _KEY_RE.search(name)
            if not m:
                continue
            layer, hf_mod, ab = int(m.group(1)), m.group(2), m.group(3)
            native = _HF_TO_NATIVE.get(hf_mod)
            if native is None:
                continue
            weights.setdefault(native, {}).setdefault(layer, {})[ab] = \
                np.asarray(f.get_tensor(name), np.float32)
    return weights, scaling


def build_deltas(model, weights, scaling: float) -> Dict[str, np.ndarray]:
    """Stack per-layer ``scaling * (B @ A)^T`` deltas into [L, in, out] arrays."""
    cfg = model.config
    deltas: Dict[str, np.ndarray] = {}
    shapes = model.param_shapes()['layers']
    for module, per_layer in weights.items():
        shape = shapes[module]
        assert isinstance(shape, tuple), \
            f'LoRA cannot merge into quantized weights ({module})'
        delta = np.zeros(shape, np.float32)
        for layer, ab in per_layer.items():
            A, B = ab['A'], ab['B']            # [r, in], [out, r]
            delta[layer] = scaling * (B @ A).T  # [in, out]
        deltas[module] = delta
    return deltas


class LoraManager:
    """Single-active-adapter manager bound to a ModelAgent."""

    def __init__(self, agent):
        self.agent = agent
        self.adapters: Dict[str, Dict[str, np.ndarray]] = {}
        self.active: Optional[str] = None

    def load(self, name: str, path: str):
        weights, scaling = load_peft_adapter(path)
        self.adapters[name] = build_deltas(self.agent.model, weights, scaling)

    def _apply(self, deltas: Dict[str, np.ndarray], sign: float):
        import jax
        import jax.numpy as jnp

        if getattr(self.agent, '_proj_fused', False):
            # merge addresses per-projection leaves by name
            self.agent.params = self.agent.model.unfuse_projections(
                self.agent.params)
            self.agent._proj_fused = False
            self.agent._step_fns.clear()
        params = self.agent.params

        @jax.jit
        def add(w, d):
            return (w.astype(jnp.float32) + sign * d).astype(w.dtype)

        layers = dict(params['layers'])
        for module, delta in deltas.items():
            layers[module] = add(layers[module], jnp.asarray(delta))
        self.agent.params = dict(params, layers=layers)

    def activate(self, name: str):
        assert name in self.adapters, f'adapter {name!r} not loaded'
        if self.active == name:
            return
        if self.active is not None:
            self._apply(self.adapters[self.active], -1.0)
        self._apply(self.adapters[name], +1.0)
        self.active = name

    def deactivate(self):
        if self.active is not None:
            self._apply(self.adapters[self.active], -1.0)
            self.active = None


# -- S-LoRA: batched multi-adapter multiplexing ---------------------------------------

SLORA_TARGETS = ('wq', 'wk', 'wv', 'wo', 'w_gate', 'w_up', 'w_down')


def build_slora_stacks(model, adapters: Dict[str, str]):
    """Load several PEFT checkpoints into scan-ready slot stacks.

    Returns (stacks, slot_map): stacks[target] = {'a': [L, S, in, rp],
    'b': [L, S, rp, out]} float32 with slot 0 all-zero (no adapter) and ranks
    zero-padded to the max across adapters; alpha/r scaling is folded into 'b'.
    Layer axis leads so the stacks ride the same ``lax.scan`` slicing as the
    base layer params (reference analog: adapter/adapter.py rank-page packing).
    """
    cfg = model.config
    L = cfg.num_layers
    loaded = [(name, *load_peft_adapter(path)) for name, path in adapters.items()]
    max_rank = 1
    for _, weights, _ in loaded:
        for per_layer in weights.values():
            for ab in per_layer.values():
                max_rank = max(max_rank, ab['A'].shape[0])

    dims = {'wq': (cfg.hidden_size, model.q_out),
            'wk': (cfg.hidden_size, model.kv_out),
            'wv': (cfg.hidden_size, model.kv_out),
            'wo': (model.q_out, cfg.hidden_size),
            'w_gate': (cfg.hidden_size, cfg.intermediate_size),
            'w_up': (cfg.hidden_size, cfg.intermediate_size),
            'w_down': (cfg.intermediate_size, cfg.hidden_size)}
    S = len(loaded) + 1
    stacks = {t: {'a': np.zeros((L, S, dims[t][0], max_rank), np.float32),
                  'b': np.zeros((L, S, max_rank, dims[t][1]), np.float32)}
              for t in SLORA_TARGETS}
    slot_map = {}
    for slot, (name, weights, scaling) in enumerate(loaded, start=1):
        slot_map[name] = slot
        for target, per_layer in weights.items():
            for layer, ab in per_layer.items():
                A, B = ab['A'], ab['B']         # [r, in], [out, r]
                r = A.shape[0]
                stacks[target]['a'][layer, slot, :, :r] = A.T
                stacks[target]['b'][layer, slot, :r, :] = scaling * B.T
    return stacks, slot_map
