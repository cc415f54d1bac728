"""Pallas TPU kernels for the serving hot loops.

Reference analog: ``src/turbomind/kernels/attention/`` (decoding.cu split-K flash
decode, paged block iteration) and ``lmdeploy/pytorch/kernels/cuda/pagedattention.py``
— redesigned for the TPU memory system: per-kv-head HBM page DMA with double
buffering into VMEM, online-softmax flash accumulation on the VPU/MXU.
"""
