"""Safetensors -> device params loader.

Reference analog: ``lmdeploy/pytorch/weight_loader/model_weight_loader.py`` (shard
iteration, per-module dispatch, TP-aware loading) and TurboMind's direct-from-HF pipeline
(``lmdeploy/turbomind/model_loader.py``).

Strategy: allocate the stacked numpy parameter tree once, stream every safetensors shard
through the model's assign-plan (writing transposed slices into the stacked arrays), then
``jax.device_put`` each leaf with its NamedSharding — a single host->device transfer per
parameter, already laid out for ``lax.scan``.
"""
from __future__ import annotations

import glob
import os
from typing import Any, Dict, Optional

import numpy as np


def _np_dtype(name: str):
    import ml_dtypes
    return {'bfloat16': ml_dtypes.bfloat16, 'float16': np.float16,
            'float32': np.float32}[name]


def iter_safetensors(model_path: str):
    """Yield (name, np_array) over all safetensors shards of a checkpoint.

    The numpy backend cannot materialize fp8 tensors (it looks up
    np.float8_e4m3fn); those go through a torch handle and a byte-view back
    into the ml_dtypes fp8 numpy type.
    """
    from safetensors import safe_open
    files = sorted(glob.glob(os.path.join(model_path, '*.safetensors')))
    if not files:
        raise FileNotFoundError(f'no *.safetensors under {model_path}')
    for path in files:
        with safe_open(path, framework='np') as f:
            torch_f = None
            for name in f.keys():
                try:
                    yield name, f.get_tensor(name)
                except Exception:
                    import ml_dtypes
                    import torch
                    if torch_f is None:
                        torch_f = safe_open(path, framework='pt')
                    t = torch_f.get_tensor(name)
                    if t.dtype == torch.float8_e4m3fn:
                        yield name, t.view(torch.uint8).numpy().view(
                            ml_dtypes.float8_e4m3fn)
                    elif t.dtype == torch.float8_e5m2:
                        yield name, t.view(torch.uint8).numpy().view(
                            ml_dtypes.float8_e5m2)
                    elif t.dtype == torch.bfloat16:
                        yield name, t.float().numpy().astype(ml_dtypes.bfloat16)
                    else:
                        yield name, t.numpy()


def _dequant_blocked_fp8(it, keep=None):
    """Iterator adapter: pair ``X.weight`` (fp8) with ``X.weight_scale_inv``
    (DeepSeek-V3 native blocked-fp8 checkpoints) and yield the dequantized
    float32 weight under ``X.weight``.

    Used by models whose stacked parameter layouts (MLA projections) do not
    carry runtime quantized leaves — the checkpoint still loads and serves
    correctly, at the model dtype's memory cost.  ``keep`` is an optional
    name predicate: matching tensors (e.g. routed expert stacks, which stay
    fp8-resident and dequantize inside ops/pallas/quant_bmm.py) pass through
    untouched, weight and scale_inv alike.  The dense llama family keeps
    blocked fp8 leaves at runtime instead (nn/linear.py _w_fp8_blocked).
    Reference analog: lmdeploy/pytorch/nn/linear/blocked_fp8.py dequant path.
    """
    import ml_dtypes

    def _is_fp8(dt):
        return dt == ml_dtypes.float8_e4m3fn or dt == ml_dtypes.float8_e5m2

    def _deq(w8, s):
        n, k = w8.shape
        s = np.asarray(s, np.float32)
        bn, bk = -(-n // s.shape[0]), -(-k // s.shape[1])
        sf = np.repeat(np.repeat(s, bn, axis=0)[:n], bk, axis=1)[:, :k]
        return w8.astype(np.float32) * sf

    pending_w: Dict[str, Any] = {}
    pending_s: Dict[str, Any] = {}
    for name, tensor in it:
        if keep is not None and keep(name):
            yield name, tensor
        elif name.endswith('.weight_scale_inv'):
            base = name[:-len('_scale_inv')]
            if base in pending_w:
                yield base, _deq(pending_w.pop(base), tensor)
            else:
                pending_s[base] = np.asarray(tensor)
        elif name.endswith('.weight') and _is_fp8(tensor.dtype):
            if name in pending_s:
                yield name, _deq(tensor, pending_s.pop(name))
            else:
                pending_w[name] = tensor
        else:
            yield name, tensor
    for name, w in pending_w.items():       # unpaired: pass through untouched
        yield name, w
    for name, s in pending_s.items():
        yield name + '_scale_inv', s


def _weight_stream(model, model_path: str):
    it = iter_safetensors(model_path)
    if getattr(model, 'dequant_on_load', False):
        it = _dequant_blocked_fp8(it, keep=getattr(model, 'keep_fp8', None))
    return it


def _alloc_tree(shapes: Dict[str, Any], dtype) -> Dict[str, Any]:
    out = {}
    for k, v in shapes.items():
        if isinstance(v, dict):
            out[k] = _alloc_tree(v, dtype)
        elif hasattr(v, 'shape') and hasattr(v, 'dtype'):   # jax.ShapeDtypeStruct
            # use the dtype object directly: np.dtype(str(...)) round-trips
            # fail for ml_dtypes types (fp8); bfloat16 leaves follow the model
            # dtype (they may be loaded as fp16/fp32 checkpoints)
            dt = dtype if 'bfloat16' in str(v.dtype) else v.dtype
            out[k] = np.zeros(v.shape, dtype=dt)
        else:
            out[k] = np.zeros(v, dtype=dtype)
    return out


def _assign(params_np, path, tensor, col):
    layer = None
    if isinstance(path[-1], int):
        layer = path[-1]
        path = path[:-1]
    node = params_np
    for p in path[:-1]:
        node = node[p]
    arr = node[path[-1]]
    if layer is not None:
        arr = arr[layer]
    if col is None:
        arr[...] = tensor
    elif isinstance(col, slice):
        arr[..., col] = tensor
    elif hasattr(col, 'e'):          # expert index (models/mixtral.py _ExpertSlice)
        arr[col.e][...] = tensor
    else:
        arr[..., col] = tensor


def load_params_np(model, model_path: str):
    """Stream HF safetensors shards into the model's stacked numpy param tree."""
    cfg = model.config
    np_dtype = _np_dtype(cfg.dtype)
    shapes = model.param_shapes()
    params_np = _alloc_tree(shapes, np_dtype)
    plan = model.make_assign_plan()

    hook = getattr(model, 'load_hook', None)
    for name, tensor in _weight_stream(model, model_path):
        entry = plan.get(name)
        if entry is None:
            if hook is not None:
                hook(name, tensor, params_np)
            continue
        entries = entry if isinstance(entry, list) else [entry]
        arr = np.asarray(tensor)
        for path, transform, col in entries:   # one HF tensor may split to many
            _assign(params_np, path, transform(arr), col)
    # config-derived constants (e.g. per-layer window schedule) that no
    # checkpoint tensor provides
    for path, value in (getattr(model, 'constant_params', lambda: {})() or {}).items():
        _assign(params_np, path, np.asarray(value), None)
    return params_np


def load_model_params(model, model_path: str, shardings: Optional[Dict] = None,
                      mesh=None):
    """Load HF safetensors into the model's stacked param tree and put on device.

    ``shardings`` is an optional pytree of PartitionSpec matching the param tree;
    with a mesh, each leaf is placed with jax.NamedSharding (XLA shards the transfer).
    """
    return put_params(load_params_np(model, model_path), shardings, mesh)


def put_params(params_np, shardings=None, mesh=None):
    """Transfer a numpy param tree to device(s), honoring shardings when given."""
    import jax

    if mesh is not None and shardings is not None:
        def put(leaf, spec):
            return jax.device_put(leaf, jax.NamedSharding(mesh, spec))
        return jax.tree_util.tree_map(put, params_np, shardings)
    return jax.tree_util.tree_map(jax.device_put, params_np)


def load_vis_params_np(model, model_path: str):
    """Stream the same shards through a VLM's vision assign-plan.

    Vision weights (tower + projector) live in a separate tree from the LM
    params — see models/llava.py for why they must not ride the per-step jit.
    """
    np_dtype = _np_dtype(model.config.dtype)
    params_np = _alloc_tree(model.vis_param_shapes(), np_dtype)
    plan = model.vis_assign_plan()
    hook = getattr(model, 'load_hook', None)
    for name, tensor in _weight_stream(model, model_path):
        entry = plan.get(name)
        if entry is None:
            if hook is not None:
                hook(name, tensor, params_np)
            continue
        entries = entry if isinstance(entry, list) else [entry]
        for path, transform, col in entries:
            _assign(params_np, path, transform(np.asarray(tensor)), col)
    return params_np
