"""W4A16 fused dequant-matmul kernel vs reference (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmdeploy_tpu.ops.pallas.quant_matmul import (dequant_w4, pack_w4,
                                                  quantize_w4, w4a16_matmul,
                                                  w4a16_matmul_reference)


@pytest.fixture(autouse=True)
def interpret_mode():
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        yield


def test_pack_roundtrip():
    """pack_w4 -> dequant_w4 recovers the nibbles (plane-packed i32 layout)."""
    rng = np.random.RandomState(0)
    K, N = 16, 4
    q = rng.randint(0, 16, (K, N)).astype(np.uint8)
    packed = pack_w4(q)
    assert packed.shape == (K // 8, N) and packed.dtype == jnp.int32
    G = K // 8
    s = jnp.ones((K // 8, N), jnp.float32)
    z = jnp.zeros((K // 8, N), jnp.float32)
    w = np.asarray(dequant_w4(packed, s, z, group_size=8), np.float32)
    np.testing.assert_array_equal(w, q.astype(np.float32))


def test_quantize_reconstruction():
    """4-bit groupwise quantization must reconstruct within one quant step."""
    rng = np.random.RandomState(1)
    K, N, gs = 256, 64, 128
    w = rng.randn(K, N).astype(np.float32)
    packed, scales, zeros = quantize_w4(jnp.asarray(w), gs)
    x = jnp.eye(K, dtype=jnp.float32)
    w_hat = np.asarray(w4a16_matmul_reference(x, packed, scales, zeros, gs))
    max_step = np.asarray(scales).max()
    assert np.abs(w_hat - w).max() <= max_step * 0.51 + 1e-6


@pytest.mark.parametrize('B,K,N,gs,bn,bk', [
    (8, 512, 128, 128, 128, 128),
    (16, 1024, 256, 128, 128, 256),
    (8, 256, 128, 64, 128, 64),        # gs=64 keeps 4*gs | K
    (8, 2048, 256, 128, 256, 512),
])
def test_kernel_matches_reference(B, K, N, gs, bn, bk):
    rng = np.random.RandomState(2)
    w = rng.randn(K, N).astype(np.float32) * 0.1
    packed, scales, zeros = quantize_w4(jnp.asarray(w), gs)
    x = jnp.asarray(rng.randn(B, K).astype(np.float32) * 0.5)

    out = w4a16_matmul(x, packed, scales, zeros, group_size=gs,
                       block_n=bn, block_k=bk)
    ref = w4a16_matmul_reference(x, packed, scales, zeros, gs)
    # kernel computes in bf16 activations; tolerate bf16-level error
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2,
                               atol=2e-2)


def test_kernel_unaligned_k_falls_back():
    """K not divisible by 4*gs dispatches to dequant+dense (still correct)."""
    rng = np.random.RandomState(6)
    B, K, N, gs = 8, 256, 128, 128
    w = rng.randn(K, N).astype(np.float32) * 0.1
    packed, scales, zeros = quantize_w4(jnp.asarray(w), gs)
    x = jnp.asarray(rng.randn(B, K).astype(np.float32) * 0.5)
    out = w4a16_matmul(x, packed, scales, zeros, group_size=gs)
    ref = w4a16_matmul_reference(x, packed, scales, zeros, gs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2,
                               atol=2e-2)


def test_matmul_accuracy_vs_dense():
    """End-to-end: quantized matmul approximates the dense product."""
    rng = np.random.RandomState(3)
    B, K, N, gs = 4, 512, 256, 128
    w = rng.randn(K, N).astype(np.float32) * 0.05
    x = jnp.asarray(rng.randn(B, K).astype(np.float32))
    packed, scales, zeros = quantize_w4(jnp.asarray(w), gs)
    out = np.asarray(w4a16_matmul(x, packed, scales, zeros, group_size=gs))
    dense = np.asarray(x) @ w
    rel = np.abs(out - dense).mean() / (np.abs(dense).mean() + 1e-9)
    # ~13% is the information-theoretic error of 4-bit/group-128 on gaussian
    # weights; real checkpoints do far better (ppl gates cover that)
    assert rel < 0.15, rel


@pytest.mark.parametrize('B', [300, 520])
def test_prefill_dequant_dense_large_m(B):
    """B > GROUP_DOT_MAX_M takes the dequant+dense MXU path."""
    rng = np.random.RandomState(4)
    K, N, gs = 512, 256, 128
    w = rng.randn(K, N).astype(np.float32) * 0.1
    packed, scales, zeros = quantize_w4(jnp.asarray(w), gs)
    x = jnp.asarray(rng.randn(B, K).astype(np.float32) * 0.5)
    out = np.asarray(w4a16_matmul(x, packed, scales, zeros, group_size=gs))
    wf = np.asarray(dequant_w4(packed, scales, zeros, gs,
                               dtype=jnp.float32), np.float32)
    exact = np.asarray(x, np.float32) @ wf
    assert out.shape == (B, N)
    np.testing.assert_allclose(out, exact, rtol=2e-2, atol=6e-2)


def test_kernel_unaligned_tokens():
    """B not a multiple of 8 pads up to a whole m-tile."""
    rng = np.random.RandomState(5)
    B, K, N, gs = 5, 512, 128, 128
    w = rng.randn(K, N).astype(np.float32) * 0.1
    packed, scales, zeros = quantize_w4(jnp.asarray(w), gs)
    x = jnp.asarray(rng.randn(B, K).astype(np.float32) * 0.5)
    out = w4a16_matmul(x, packed, scales, zeros, group_size=gs,
                       block_n=128, block_k=128)
    ref = w4a16_matmul_reference(x, packed, scales, zeros, gs)
    assert out.shape == (B, N)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2,
                               atol=2e-2)
