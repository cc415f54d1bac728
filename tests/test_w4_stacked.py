"""Round-5 stacked W4A16 path: prepared leaves, layer-indexed Pallas kernel
(interpret mode on CPU), and the LlamaModel scan injection.

Reference analog: the tuned fused W4A16 GEMMs of
``src/turbomind/kernels/gemm/`` — here redesigned as a stacked-layer Pallas
kernel that reads the full [L, ...] weight stacks with a scalar-prefetched
layer index (no per-layer slice materialization; see
ops/pallas/quant_matmul.py round-5 notes).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmdeploy_tpu.ops.pallas.quant_matmul import (
    dequant_w4, dequant_w4_szc, prep_w4, quantize_w4, w4a16_matmul_stacked)


@pytest.fixture(autouse=True)
def interpret_mode():
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        yield


def _make_stack(rng, L, K, N, gs, mode):
    packs, sbs, ccs, refs = [], [], [], []
    for _ in range(L):
        w = jnp.asarray(rng.randn(K, N).astype(np.float32) * 0.02,
                        jnp.bfloat16)
        p, s, z = quantize_w4(w, gs)
        sb, cc = prep_w4(s, z, mode=mode)
        packs.append(p), sbs.append(sb), ccs.append(cc)
        refs.append((p, s, z))
    return (jnp.stack(packs), jnp.stack(sbs), jnp.stack(ccs)), refs


@pytest.mark.parametrize('mode', ['precise', 'fast', 'gd'])
def test_dequant_szc_matches_f32_reference(mode):
    rng = np.random.RandomState(0)
    K, N, gs = 512, 128, 128
    w = jnp.asarray(rng.randn(K, N).astype(np.float32) * 0.02, jnp.bfloat16)
    p, s, z = quantize_w4(w, gs)
    sb, cc = prep_w4(s, z, mode=mode)
    w_ref = np.asarray(dequant_w4(p, s, z, gs), np.float32)
    w_szc = np.asarray(dequant_w4_szc(p, sb, cc, gs), np.float32)
    # only the bf16 rounding of the scales separates the two
    step = np.asarray(s).max()
    assert np.abs(w_szc - w_ref).max() <= step * 0.1


@pytest.mark.parametrize('mode', ['precise', 'fast', 'gd'])
@pytest.mark.parametrize('B,K,N,gs', [(8, 512, 128, 128), (64, 1024, 256, 128)])
def test_stacked_kernel_matches_reference(mode, B, K, N, gs):
    rng = np.random.RandomState(1)
    L = 3
    (packed, sb, cc), refs = _make_stack(rng, L, K, N, gs, mode)
    x = jnp.asarray(rng.randn(B, K).astype(np.float32), jnp.bfloat16)
    for li in range(L):
        y = np.asarray(
            w4a16_matmul_stacked(x, packed, sb, cc, li, gs), np.float32)
        w_ref = dequant_w4(*refs[li], gs)
        y_ref = np.asarray(jnp.dot(x, w_ref,
                                   preferred_element_type=jnp.float32))
        denom = np.abs(y_ref).mean() + 1e-6
        rel = np.abs(y - y_ref).mean() / denom
        # precise: bf16-dequant rounding class; gd: no per-weight rounding
        # at all (tightest); fast: per-weight (128+q)*s bf16 rounding
        assert rel < (0.12 if mode == 'fast' else 0.01), rel


@pytest.mark.parametrize('mode', ['precise', 'fast', 'gd'])
def test_linear_dispatch_prepped_leaf(mode):
    """linear() on a prepared stacked leaf with a traced layer index matches
    the old {'packed','scales','zeros'} leaf per layer (CPU dense path)."""
    from lmdeploy_tpu.nn.linear import linear
    rng = np.random.RandomState(2)
    L, K, N, gs = 3, 256, 64, 128
    (packed, sb, cc), refs = _make_stack(rng, L, K, N, gs, mode)
    x = jnp.asarray(rng.randn(4, K).astype(np.float32), jnp.bfloat16)
    for li in range(L):
        y = linear(x, {'packed': packed, 'sb': sb, 'corr': cc,
                       'layer': jnp.int32(li)})
        p, s, z = refs[li]
        y_old = linear(x, {'packed': p, 'scales': s, 'zeros': z})
        # fast mode carries the kernel's per-weight bf16 product rounding
        # even on the CPU dense path (numerics-matched fallback)
        # (fast error scales ~0.15*s*sqrt(K) across the reduction)
        tol = float(np.asarray(s).max()) * (1.5 * np.sqrt(K)
                                            if mode == 'fast' else 1.0)
        np.testing.assert_allclose(np.asarray(y, np.float32),
                                   np.asarray(y_old, np.float32),
                                   rtol=0, atol=tol)


def test_llama_forward_injects_stacks(tiny_model_dir):
    """A w4a16 llama forward with prepared leaves matches the unprepared
    forward (greedy logits close; CPU dense fallback path)."""
    import json
    import os
    from lmdeploy_tpu.config import ModelConfig
    from lmdeploy_tpu.models import build_model

    with open(os.path.join(tiny_model_dir, 'config.json')) as f:
        hf_cfg = json.load(f)
    hf_cfg['quantization_config'] = {'quant_method': 'awq', 'group_size': 32,
                                     'bits': 4}
    model = build_model(ModelConfig.from_hf_config(hf_cfg))
    assert model.quant_method == 'w4a16'
    params = model.init_params(jax.random.PRNGKey(0))
    # quantize real random weights so scales/zeros are meaningful
    lp = params['layers']
    for name in ('wq', 'wk', 'wv', 'wo', 'w_gate', 'w_up', 'w_down'):
        leaf = lp[name]
        L = leaf['packed'].shape[0]
        K = leaf['packed'].shape[1] * 8
        N = leaf['packed'].shape[2]
        packs, ss, zs = [], [], []
        rng = np.random.RandomState(hash(name) % 2**31)
        for i in range(L):
            w = jnp.asarray(rng.randn(K, N).astype(np.float32) * 0.05,
                            jnp.bfloat16)
            p, s, z = quantize_w4(w, 32)
            packs.append(p), ss.append(s), zs.append(z)
        lp[name] = {'packed': jnp.stack(packs), 'scales': jnp.stack(ss),
                    'zeros': jnp.stack(zs)}

    prepped = model.prep_quant_leaves(params)
    assert 'sb' in prepped['layers']['wq']

    from lmdeploy_tpu.models.llama import AttnMeta
    from lmdeploy_tpu.nn.layers import make_rope_table
    B, T = 2, 5
    cfg = model.config
    ids = jnp.asarray(np.random.RandomState(0).randint(
        0, cfg.vocab_size, (B, T)), jnp.int32)
    pos = jnp.tile(jnp.arange(T, dtype=jnp.int32)[None], (B, 1))
    from lmdeploy_tpu.ops.attention import kv_row_width
    nb, bs = 8, 16
    _, rowp = kv_row_width(cfg.num_key_value_heads, cfg.head_dim)
    kv = jnp.zeros((cfg.num_layers, nb, 2, bs, rowp), jnp.bfloat16)
    meta = AttnMeta(
        block_tables=jnp.tile(jnp.arange(4, dtype=jnp.int32)[None], (B, 1)),
        history_lens=jnp.zeros((B,), jnp.int32),
        q_lens=jnp.full((B,), T, jnp.int32))
    cos, sin = make_rope_table(cfg.rope_dim, 64, cfg.rope_theta, None)

    lo_old, _ = model.forward(params, ids, pos, kv, meta, cos, sin)
    lo_new, _ = model.forward(prepped, ids, pos, kv, meta, cos, sin)
    a = np.asarray(lo_old, np.float32)
    b = np.asarray(lo_new, np.float32)
    # identical argmax and near-identical logits (scale-rounding only)
    assert (a.argmax(-1) == b.argmax(-1)).mean() > 0.9
    np.testing.assert_allclose(a, b, rtol=0.05, atol=0.2)


def test_unaligned_k_pads_to_plane_groups():
    """K=11008-style geometry (llama2-7b down_proj) pads to whole quant
    groups x 4 planes (lite/formats.py pad_k4); the product is exact because
    pad rows see zero activations and (0-0)*1 weights."""
    from lmdeploy_tpu.lite import formats
    from lmdeploy_tpu.nn.linear import linear
    rng = np.random.RandomState(3)
    K, N, gs = 160, 64, 32            # pad_k4 -> 256
    assert formats.pad_k4(K, gs) == 256
    w = rng.randn(K, N).astype(np.float32) * 0.05
    # quantize the ORIGINAL K, emulate checkpoint tensors, then load-pad
    g = K // gs
    wg = w.reshape(g, gs, N)
    sc = (wg.max(1) - wg.min(1)) / 15.0
    sc = np.where(sc == 0, 1.0, sc)
    zp = np.clip(np.round(-wg.min(1) / sc), 0, 15)
    q = np.clip(np.round(wg / sc[:, None] + zp[:, None]), 0, 15
                ).reshape(K, N).astype(np.uint8)
    packed = formats.to_kernel_packed(formats._pad_rows(q, 256))
    scales = formats.pad_groups(sc, 256 // gs, 1.0)
    zeros = formats.pad_groups(zp, 256 // gs, 0.0)
    x = jnp.asarray(rng.randn(4, K).astype(np.float32), jnp.bfloat16)
    y = linear(x, {'packed': jnp.asarray(packed), 'scales': jnp.asarray(scales),
                   'zeros': jnp.asarray(zeros)})
    w_hat = ((q.reshape(g, gs, N) - zp[:, None]) * sc[:, None]).reshape(K, N)
    y_ref = np.asarray(x, np.float32) @ w_hat
    np.testing.assert_allclose(np.asarray(y, np.float32), y_ref,
                               rtol=0.05, atol=0.05)
