"""Serving stack: paged-KV pool, quantized serving model, continuous batcher.

TPU-native equivalent of the reference's ``e2e/punica-atom`` subsystem
(SURVEY.md §2.3): the scheduler and page allocator are host-side Python (as in
the reference), every per-step compute is a handful of jitted XLA programs with
static (bucketed) shapes, and the KV cache lives in the kernel nibble-plane
layout consumed directly by the Pallas decode-attention kernel.
"""
from atom_tpu.serving.kvpool import KvPool, SeqKvCache
from atom_tpu.serving.engine import TextGenEngine, TextGenConfig
from atom_tpu.serving.workload import RequestSet, synth_requests
