"""Paged KV-cache allocation in TPU HBM.

Reference analog: ``lmdeploy/pytorch/engine/cache_engine.py`` (CacheEngine ``:205``) and
the free-memory -> num_blocks derivation in ``engine/executor/base.py:175-245``.

The cache is ONE array ``[num_layers, num_blocks, 2, block_size, HDp]``: each
page holds a K plane and a V plane of head-major ``[block_size, Hkv*D]`` token
rows (``ops/attention.py kv_row_width``).  Rationale: decode attention on TPU
is DMA-issue-bound — one packed page ([2, BS, HDp], K and V adjacent) is one
DMA (measured 5.7x faster than the round-1 per-head pages), plane separation
keeps the decode kernel's dots and accumulators at HDp lanes, the fill is one
scatter line per token per plane, and the head-major row eliminates the
head-dim lane padding that doubled HBM bytes for D=64 models.
The array is allocated once and donated through every jitted step so XLA updates
it in place.  Block 0 is the reserved padding block (see paging/block_manager.py).
"""
from __future__ import annotations

import numpy as np

from ..config import CacheConfig, ModelConfig
from ..messages import QuantPolicy


class CacheEngine:

    def __init__(self, model_config: ModelConfig, cache_config: CacheConfig,
                 mesh=None, cache_spec=None, reserved_bytes: int = 0,
                 extra_block_bytes: int = 0):
        import jax
        import jax.numpy as jnp
        from ..ops.attention import kv_row_width

        self.model_config = model_config
        self.cache_config = cache_config
        self.mesh = mesh
        self.reserved_bytes = reserved_bytes
        # extra per-block bytes carried by auxiliary caches sharing the block
        # ids (memdecode memory-model pages)
        self.extra_block_bytes = extra_block_bytes

        if cache_config.num_gpu_blocks <= 0:
            cache_config.num_gpu_blocks = self._derive_num_blocks()
        self.num_blocks = cache_config.num_gpu_blocks

        cfg = model_config
        self.row_width, self.padded_row_width = kv_row_width(
            cfg.num_key_value_heads, cfg.cache_head_dim)
        self.cache_layers = cfg.num_cache_layers or cfg.num_layers
        shape = (self.cache_layers, self.num_blocks, 2,
                 cache_config.block_size, self.padded_row_width)
        dtype = self._cache_dtype()

        sharding = None
        if mesh is not None and cache_spec is not None:
            sharding = jax.NamedSharding(mesh, cache_spec)

        def put_scale(s):
            if mesh is not None and cache_spec is not None:
                from jax.sharding import PartitionSpec
                # scales [L, NB, 2, Hkv, BS]: head dim follows the plane
                # split, slot dim follows the cp stripe
                s = jax.device_put(s, jax.NamedSharding(
                    mesh, PartitionSpec(None, None, None, cache_spec[4],
                                        cache_spec[3])))
            return s

        scale_shape = (self.cache_layers, self.num_blocks, 2,
                       cfg.num_key_value_heads, cache_config.block_size)

        def alloc():
            if self.cache_config.quant_policy == QuantPolicy.TURBO_QUANT:
                # K nibble-per-coord pages (V uses 2-bit fields of the same
                # padded row) + per-token (norm, residual-norm) meta
                from ..ops.kv_quant import QuantKVTurbo
                _, rowt = kv_row_width(cfg.num_key_value_heads,
                                       cfg.cache_head_dim // 2)
                assert cfg.cache_head_dim % 4 == 0
                z = jnp.zeros(shape[:3] + (cache_config.block_size, rowt),
                              jnp.uint8)
                if sharding is not None:
                    z = jax.device_put(z, sharding)
                meta_shape = (self.cache_layers, self.num_blocks, 2, 2,
                              cfg.num_key_value_heads,
                              cache_config.block_size)
                return QuantKVTurbo(z, jnp.zeros(meta_shape, jnp.float32))
            if self.cache_config.quant_policy == QuantPolicy.KV_INT4:
                # token-pair-packed 4-bit pages + per-token (scale, min)
                from ..ops.kv_quant import QuantKV4
                assert cache_config.block_size % 2 == 0
                z = jnp.zeros(shape[:3] + (cache_config.block_size // 2,
                                           self.padded_row_width), jnp.uint8)
                if sharding is not None:
                    z = jax.device_put(z, sharding)
                return QuantKV4(z, put_scale(jnp.zeros(scale_shape, jnp.float32)),
                                put_scale(jnp.zeros(scale_shape, jnp.float32)))
            z = jnp.zeros(shape, dtype)
            if sharding is not None:
                z = jax.device_put(z, sharding)
            if self.cache_config.quant_policy == QuantPolicy.KV_INT8:
                # per-token scales ride with the pages as one pytree node.
                # Layout [L, NB, 2, BS, Hkv] (token-major rows): the decode
                # fill then scatters whole [Hkv] rows exactly like the data
                # planes — the old [.., Hkv, BS] layout forced a per-element
                # scatter that XLA could not alias, copying the ENTIRE scale
                # array every layer (measured 12.3 ms/step at llama2-7b MHA)
                from ..ops.kv_quant import QuantKV
                s8 = (self.cache_layers, self.num_blocks, 2,
                      cache_config.block_size, cfg.num_key_value_heads)
                return QuantKV(z, put_scale(jnp.zeros(s8, jnp.float32)))
            return z

        self.kv_cache = alloc()

    def _cache_dtype(self):
        import jax.numpy as jnp
        policy = self.cache_config.quant_policy
        if policy == QuantPolicy.KV_INT8:
            return jnp.int8
        if policy == QuantPolicy.KV_FP8:
            return jnp.float8_e4m3fn
        return self.model_config.jnp_dtype()

    def block_bytes(self) -> int:
        from ..ops.attention import kv_row_width
        cfg = self.model_config
        itemsize = np.dtype('float32').itemsize if cfg.dtype == 'float32' else 2
        policy = self.cache_config.quant_policy
        if policy in (QuantPolicy.KV_INT8, QuantPolicy.KV_FP8):
            itemsize = 1
        _, rowp = kv_row_width(cfg.num_key_value_heads, cfg.cache_head_dim)
        layers = cfg.num_cache_layers or cfg.num_layers
        per = layers * 2 * self.cache_config.block_size * rowp * itemsize
        if policy == QuantPolicy.KV_INT4:   # nibble-packed + scale + min
            per = per // 2 + (2 * layers * self.cache_config.block_size *
                              cfg.num_key_value_heads * 8)
        elif policy == QuantPolicy.TURBO_QUANT:
            # K 4-bit + V sharing the K-width row (2-bit used) + 2 f32 metas
            _, rowt = kv_row_width(cfg.num_key_value_heads,
                                   cfg.cache_head_dim // 2)
            per = (layers * 2 * self.cache_config.block_size * rowt
                   + 2 * layers * 2 * self.cache_config.block_size *
                   cfg.num_key_value_heads * 4)
        elif policy == QuantPolicy.KV_INT8:  # + per-token f32 scales
            per += (2 * layers * self.cache_config.block_size *
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
        num = max(budget // (self.block_bytes() + self.extra_block_bytes), 16)
        return int(num)

    def swap_caches(self, kv_cache):
        """Adopt the updated (donated-through) cache array after a step."""
        self.kv_cache = kv_cache

    # -- host swap (reference: cache_engine swap_in/swap_out + cpu blocks) -------------
    def ensure_host_pool(self, num_cpu_blocks: int):
        """Allocate host-RAM KV block storage (numpy), lazily on first swap."""
        import jax
        if getattr(self, 'host_kv', None) is not None or num_cpu_blocks <= 0:
            return

        self.host_kv = jax.tree_util.tree_map(
            lambda x: np.zeros((x.shape[0], num_cpu_blocks) + x.shape[2:],
                               x.dtype), self.kv_cache)

    def swap_out(self, pairs):
        """Copy device blocks to host slots: pairs = [(dev_id, host_id), ...]."""
        import jax
        dev_ids = [p[0] for p in pairs]
        host_ids = [p[1] for p in pairs]

        def leaf(d, h):
            h[:, host_ids] = np.asarray(d[:, dev_ids])
            return h

        self.host_kv = jax.tree_util.tree_map(leaf, self.kv_cache, self.host_kv)

    def swap_in(self, pairs):
        """Copy host slots back into device blocks: pairs = [(host_id, dev_id)]."""
        import jax
        import jax.numpy as jnp
        host_ids = [p[0] for p in pairs]
        dev_ids = np.asarray([p[1] for p in pairs])

        def leaf(h, d):
            return d.at[:, jnp.asarray(dev_ids)].set(jnp.asarray(h[:, host_ids]))

        self.kv_cache = jax.tree_util.tree_map(leaf, self.host_kv, self.kv_cache)
