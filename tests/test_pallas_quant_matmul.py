"""W4A16 fused dequant-matmul kernel vs reference (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmdeploy_tpu.ops.pallas.quant_matmul import (pack_w4, quantize_w4, w4a16_matmul,
                                                  w4a16_matmul_reference)


@pytest.fixture(autouse=True)
def interpret_mode():
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        yield


def test_pack_roundtrip():
    rng = np.random.RandomState(0)
    q = rng.randint(0, 16, (8, 4)).astype(np.uint8)
    packed = np.asarray(pack_w4(jnp.asarray(q)))
    lo = packed & 0xF
    hi = packed >> 4
    np.testing.assert_array_equal(lo, q[:4])      # half-split layout
    np.testing.assert_array_equal(hi, q[4:])


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


@pytest.mark.parametrize('B,K,N,gs,bn,bk2', [
    (8, 256, 128, 128, 128, 128),
    (16, 512, 256, 128, 128, 256),
    (8, 256, 128, 64, 128, 128),
    (8, 1024, 256, 128, 256, 512),
])
def test_kernel_matches_reference(B, K, N, gs, bn, bk2):
    rng = np.random.RandomState(2)
    w = rng.randn(K, N).astype(np.float32) * 0.1
    packed, scales, zeros = quantize_w4(jnp.asarray(w), gs)
    x = jnp.asarray(rng.randn(B, K).astype(np.float32) * 0.5)

    out = w4a16_matmul(x, packed, scales, zeros, group_size=gs,
                       block_n=bn, block_k2=bk2)
    ref = w4a16_matmul_reference(x, packed, scales, zeros, gs)
    # kernel computes in bf16 activations; tolerate bf16-level error
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
def test_kernel_prescale_mode_large_m(B):
    """B > GROUP_DOT_MAX_M takes the pre-scale single-dot schedule (and
    exercises m-tiling + token padding).  The pre-scale mode rounds q*s to
    bf16 per weight (vs the reference's (q-z)*s), so compare against the
    EXACT f32 dequant product: both must sit within bf16-accumulation noise,
    which is well under the 4-bit quantization noise itself."""
    rng = np.random.RandomState(4)
    K, N, gs = 512, 256, 128
    w = rng.randn(K, N).astype(np.float32) * 0.1
    packed, scales, zeros = quantize_w4(jnp.asarray(w), gs)
    x = jnp.asarray(rng.randn(B, K).astype(np.float32) * 0.5)
    out = np.asarray(w4a16_matmul(x, packed, scales, zeros, group_size=gs,
                                  block_m=256, block_n=128, block_k2=256))
    p = np.asarray(packed)
    q = np.concatenate([p & 0xF, p >> 4], 0).astype(np.float32)
    wf = ((q.reshape(K // gs, gs, N) - np.asarray(zeros)[:, None])
          * np.asarray(scales)[:, None]).reshape(K, N)
    exact = np.asarray(x, np.float32) @ wf
    assert out.shape == (B, N)
    np.testing.assert_allclose(out, exact, rtol=2e-2, atol=6e-2)


def test_kernel_unaligned_tokens():
    """B not a multiple of 8 pads up to a whole m-tile."""
    rng = np.random.RandomState(5)
    B, K, N, gs = 5, 256, 128, 128
    w = rng.randn(K, N).astype(np.float32) * 0.1
    packed, scales, zeros = quantize_w4(jnp.asarray(w), gs)
    x = jnp.asarray(rng.randn(B, K).astype(np.float32) * 0.5)
    out = w4a16_matmul(x, packed, scales, zeros, group_size=gs,
                       block_n=128, block_k2=128)
    ref = w4a16_matmul_reference(x, packed, scales, zeros, gs)
    assert out.shape == (B, N)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2,
                               atol=2e-2)
