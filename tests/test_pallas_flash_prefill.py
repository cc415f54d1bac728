"""Flash prefill kernel vs naive dense causal attention (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(autouse=True)
def interpret_mode():
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        yield


def naive(q, k, v, scale):
    B, T, Hq, D = q.shape
    Hkv = k.shape[2]
    G = Hq // Hkv
    kr = np.repeat(k, G, axis=2)
    vr = np.repeat(v, G, axis=2)
    s = np.einsum('bthd,bshd->bhts', q, kr) * scale
    mask = np.tril(np.ones((T, T), bool))
    s = np.where(mask[None, None], s, -1e30)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    return np.einsum('bhts,bshd->bthd', p, vr)


@pytest.mark.parametrize('B,T,Hq,Hkv,D,tq,tk', [
    (2, 128, 4, 2, 64, 64, 64),
    (1, 256, 8, 2, 64, 128, 128),
    (2, 128, 2, 2, 32, 128, 64),
])
def test_flash_matches_naive(B, T, Hq, Hkv, D, tq, tk):
    from lmdeploy_tpu.ops.pallas.flash_prefill import flash_prefill_attention
    rng = np.random.RandomState(0)
    q = rng.randn(B, T, Hq, D).astype(np.float32)
    k = rng.randn(B, T, Hkv, D).astype(np.float32)
    v = rng.randn(B, T, Hkv, D).astype(np.float32)
    scale = D ** -0.5
    out = flash_prefill_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                                  scale, tile_q=tq, tile_k=tk)
    ref = naive(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)
