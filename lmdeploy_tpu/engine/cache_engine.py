"""Paged KV-cache allocation in TPU HBM.

Reference analog: ``lmdeploy/pytorch/engine/cache_engine.py`` (CacheEngine ``:205``) and
the free-memory -> num_blocks derivation in ``engine/executor/base.py:175-245``.

The cache is two arrays ``[num_layers, num_blocks, block_size, kv_heads, head_dim]``
(K and V), allocated once and donated through every jitted step so XLA updates them
in place.  Block 0 is the reserved padding block (see paging/block_manager.py).
"""
from __future__ import annotations

import numpy as np

from ..config import CacheConfig, ModelConfig
from ..messages import QuantPolicy


class CacheEngine:

    def __init__(self, model_config: ModelConfig, cache_config: CacheConfig,
                 mesh=None, cache_spec=None, reserved_bytes: int = 0):
        import jax
        import jax.numpy as jnp

        self.model_config = model_config
        self.cache_config = cache_config
        self.mesh = mesh
        self.reserved_bytes = reserved_bytes

        if cache_config.num_gpu_blocks <= 0:
            cache_config.num_gpu_blocks = self._derive_num_blocks()
        self.num_blocks = cache_config.num_gpu_blocks

        cfg = model_config
        # head-major, slot-major pages [BS, Dp]: token rows are contiguous for both
        # the fill scatter and the decode kernel's page DMAs.  head_dim is padded up
        # to a full 128-lane tile: XLA pads the HBM buffer to the tile anyway, and
        # Mosaic requires lane-dim DMA slices in 128 units — explicit padding makes
        # the padding visible instead of fighting it (zeros there contribute nothing
        # to the attention contractions).
        self.padded_head_dim = ((cfg.cache_head_dim + 127) // 128) * 128
        shape = (cfg.num_layers, cfg.num_key_value_heads, self.num_blocks,
                 cache_config.block_size, self.padded_head_dim)
        dtype = self._cache_dtype()

        sharding = None
        if mesh is not None and cache_spec is not None:
            sharding = jax.NamedSharding(mesh, cache_spec)

        def put_scale(s):
            if mesh is not None and cache_spec is not None:
                from jax.sharding import PartitionSpec
                s = jax.device_put(s, jax.NamedSharding(
                    mesh, PartitionSpec(*cache_spec[:-1])))
            return s

        def alloc():
            if self.cache_config.quant_policy == QuantPolicy.KV_INT4:
                # token-pair-packed 4-bit pages + per-token (scale, min)
                from ..ops.kv_quant import QuantKV4
                assert cache_config.block_size % 2 == 0
                z = jnp.zeros(shape[:-2] + (cache_config.block_size // 2,
                                            self.padded_head_dim), jnp.uint8)
                if sharding is not None:
                    z = jax.device_put(z, sharding)
                return QuantKV4(z, put_scale(jnp.zeros(shape[:-1], jnp.float32)),
                                put_scale(jnp.zeros(shape[:-1], jnp.float32)))
            z = jnp.zeros(shape, dtype)
            if sharding is not None:
                z = jax.device_put(z, sharding)
            if self.cache_config.quant_policy == QuantPolicy.KV_INT8:
                # per-token scales ride with the pages as one pytree node
                from ..ops.kv_quant import QuantKV
                return QuantKV(z, put_scale(jnp.zeros(shape[:-1], jnp.float32)))
            return z

        self.k_cache = alloc()
        self.v_cache = alloc()

    def _cache_dtype(self):
        import jax.numpy as jnp
        policy = self.cache_config.quant_policy
        if policy == QuantPolicy.KV_INT8:
            return jnp.int8
        if policy == QuantPolicy.KV_FP8:
            return jnp.float8_e4m3fn
        return self.model_config.jnp_dtype()

    def block_bytes(self) -> int:
        cfg = self.model_config
        itemsize = np.dtype('float32').itemsize if cfg.dtype == 'float32' else 2
        policy = self.cache_config.quant_policy
        if policy in (QuantPolicy.KV_INT8, QuantPolicy.KV_FP8):
            itemsize = 1
        padded_d = ((cfg.cache_head_dim + 127) // 128) * 128
        per = (2 * cfg.num_layers * self.cache_config.block_size *
               cfg.num_key_value_heads * padded_d * itemsize)
        if policy == QuantPolicy.KV_INT4:   # nibble-packed + scale + min
            per = per // 2 + (2 * cfg.num_layers * self.cache_config.block_size *
                              cfg.num_key_value_heads * 8)
        elif policy == QuantPolicy.KV_INT8:  # + per-token f32 scales
            per += (2 * cfg.num_layers * self.cache_config.block_size *
                    cfg.num_key_value_heads * 4)
        return per

    def _derive_num_blocks(self) -> int:
        """Free-HBM -> block count, after weights are resident (call post weight load)."""
        import jax

        dev = jax.devices()[0]
        stats = {}
        try:
            stats = dev.memory_stats() or {}
        except Exception:
            pass
        import os
        limit = stats.get('bytes_limit', 0)
        in_use = stats.get('bytes_in_use', 0)
        if limit > 0:
            free = limit - in_use
        elif jax.default_backend() == 'cpu':
            # CPU backend: small default for tests
            free = 256 * 1024 * 1024
        else:
            # TPU backends without memory_stats (e.g. the axon tunnel): assume the
            # chip HBM size, subtract resident weights + jit/activation headroom.
            hbm = int(os.environ.get('LMDEPLOY_TPU_HBM_BYTES', 16 * 1024**3))
            headroom = int(os.environ.get('LMDEPLOY_TPU_HEADROOM_BYTES',
                                          int(1.5 * 1024**3)))
            free = hbm - self.reserved_bytes - headroom
        budget = int(free * self.cache_config.cache_max_entry_count)
        cfg = self.model_config
        num = max(budget // self.block_bytes(), 16)
        return int(num)

    def swap_caches(self, k_cache, v_cache):
        """Adopt updated (donated-through) cache arrays after a step."""
        self.k_cache = k_cache
        self.v_cache = v_cache

    # -- host swap (reference: cache_engine swap_in/swap_out + cpu blocks) -------------
    def ensure_host_pool(self, num_cpu_blocks: int):
        """Allocate host-RAM KV block storage (numpy), lazily on first swap."""
        import jax
        if getattr(self, 'host_k', None) is not None or num_cpu_blocks <= 0:
            return

        def host_like(dev):
            return jax.tree_util.tree_map(
                lambda x: np.zeros((x.shape[0], x.shape[1], num_cpu_blocks)
                                   + x.shape[3:], x.dtype), dev)

        self.host_k = host_like(self.k_cache)
        self.host_v = host_like(self.v_cache)

    def swap_out(self, pairs):
        """Copy device blocks to host slots: pairs = [(dev_id, host_id), ...]."""
        import jax
        dev_ids = [p[0] for p in pairs]
        host_ids = [p[1] for p in pairs]

        def copy(dev, host):
            def leaf(d, h):
                h[:, :, host_ids] = np.asarray(d[:, :, dev_ids])
                return h
            return jax.tree_util.tree_map(leaf, dev, host)

        self.host_k = copy(self.k_cache, self.host_k)
        self.host_v = copy(self.v_cache, self.host_v)

    def swap_in(self, pairs):
        """Copy host slots back into device blocks: pairs = [(host_id, dev_id)]."""
        import jax
        import jax.numpy as jnp
        host_ids = [p[0] for p in pairs]
        dev_ids = np.asarray([p[1] for p in pairs])

        def copy(host, dev):
            def leaf(h, d):
                return d.at[:, :, jnp.asarray(dev_ids)].set(
                    jnp.asarray(h[:, :, host_ids]))
            return jax.tree_util.tree_map(leaf, host, dev)

        self.k_cache = copy(self.host_k, self.k_cache)
        self.v_cache = copy(self.host_v, self.v_cache)
