"""Engine-level data parallelism: independent worksets over mesh slices.

The production DP pattern for serving (SURVEY.md §2.4 — the reference has no
distributed backend; its only "parallelism" is greedy layer placement):
each dp group owns a full model replica on its TP submesh, its own KV pool
and serving state, and an independent FCFS workset.  No cross-group
communication exists at all — requests are partitioned up front and each
group's engine loop runs in its own host thread (JAX dispatch is thread-safe
and async, so groups' device programs overlap on disjoint device sets).

Composes with tensor parallelism: a 16-chip pod slice can run dp=4 groups of
tp=4, built from four 4-device submeshes.
"""
from __future__ import annotations

import threading
from typing import List

import numpy as np

from atom_tpu.serving.engine import TextGenEngine
from atom_tpu.serving.workload import RequestSet


def split_requests(rs: RequestSet, dp: int) -> List[RequestSet]:
    """Round-robin request partition (keeps arrival order inside a group)."""
    parts = []
    for i in range(dp):
        idx = np.arange(i, len(rs), dp)
        parts.append(RequestSet(
            prompt_lens=np.asarray(rs.prompt_lens)[idx],
            output_lens=np.asarray(rs.output_lens)[idx],
            prompts=[rs.prompts[j] for j in idx],
        ))
    return parts


def run_data_parallel(
    engines: List[TextGenEngine], rs: RequestSet, progress: bool = False,
    record: bool = False,
) -> dict:
    """Run the workload across dp engine replicas; returns aggregate stats.

    Throughput is the sum over groups against the slowest group's wall clock
    (all groups start together — the deployment-relevant number).
    ``record=True`` adds per-group token transcripts (``per_group[i]["tokens"]``)
    for replica-parity checks.
    """
    parts = split_requests(rs, len(engines))
    results: List[dict] = [None] * len(engines)

    def worker(i):
        results[i] = engines[i].run(
            parts[i], progress=progress and i == 0, record=record
        )

    threads = [
        threading.Thread(target=worker, args=(i,), daemon=True)
        for i in range(len(engines))
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    elapsed = max(r["elapsed_s"] for r in results)
    total = sum(r["total_tokens"] for r in results)
    out = sum(r["output_tokens"] for r in results)
    return {
        "dp": len(engines),
        "elapsed_s": elapsed,
        "requests": sum(r["requests"] for r in results),
        "total_tokens": total,
        "output_tokens": out,
        "throughput_tok_s": total / elapsed,
        "output_tok_s": out / elapsed,
        "ttft_avg_s": float(np.mean([r["ttft_avg_s"] for r in results])),
        "decode_ms_per_token_avg": float(
            np.mean([r["decode_ms_per_token_avg"] for r in results])
        ),
        "per_group": results,
    }


def make_dp_tp_engines(
    params, cfg, spec, tg, devices, dp: int, tp: int
) -> List[TextGenEngine]:
    """dp TextGenEngines, group ``i`` on devices[i*tp:(i+1)*tp] as a tp mesh.

    Each group re-shards the (host/replicated) params over its own submesh —
    replicas hold identical weights, per-group KV pools/states are private.
    """
    from jax.sharding import Mesh

    from atom_tpu.serving.kvpool import KvPool
    from atom_tpu.serving.parallel import (
        make_state_sharded,
        make_tp_step_fns,
        shard_serving_params,
    )

    assert len(devices) >= dp * tp
    engines = []
    n_pool = tg.batch_size * tg.max_seq_len // tg.page_size + 16
    for i in range(dp):
        mesh = Mesh(
            np.asarray(devices[i * tp : (i + 1) * tp]), ("tp",)
        )
        sparams = shard_serving_params(params, cfg, mesh)
        state = make_state_sharded(
            cfg.num_layers, n_pool, tg.batch_size, cfg.num_kv_heads,
            tg.page_size, cfg.head_dim, mesh,
        )
        pool = KvPool(
            cfg.num_layers, n_pool, cfg.num_kv_heads, tg.page_size,
            cfg.head_dim,
        )
        prefill_fn, decode_fn = make_tp_step_fns(sparams, cfg, spec, mesh)
        engines.append(TextGenEngine(tg, pool, prefill_fn, decode_fn, state))
    return engines
