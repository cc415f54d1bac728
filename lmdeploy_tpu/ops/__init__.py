"""Device ops: jnp reference implementations + Pallas TPU kernels behind one dispatch.

Reference analog: ``lmdeploy/pytorch/backends/`` (OpType + get_backend selector) and
``lmdeploy/pytorch/kernels/cuda/``.  On TPU the split is: XLA-fused jnp for everything it
fuses well, Pallas for the paged-attention / quant hot loops.
"""
from .attention import fill_kv_cache, paged_attention  # noqa: F401
from .sampling import SamplingInputs, sample_logits  # noqa: F401
