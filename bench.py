#!/usr/bin/env python
"""Benchmark: mixed full-text workload QPS on one device.

Builds a synthetic Zipf corpus (pretokenized fast path), runs a mixed query
workload mirroring BASELINE configs 1-2 (single-term BM25 top-k, boolean
AND/OR, integer range filters), and prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "qps", "vs_baseline": ...}

The reference repo publishes no benchmark numbers (SURVEY §6 — README makes
qualitative claims only, test/bench-results is a stub), so vs_baseline is
measured against VS_BASELINE_QPS: a fixed reference point of 2000 QPS, a
conservative estimate of single-node Manticore on an equivalent mixed
workload/corpus; it makes round-over-round progress comparable.
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np

VS_BASELINE_QPS = 2000.0


def build_corpus(n_docs: int, vocab: int, avg_len: int, seed: int = 42):
    from manticoresearch_tpu.index.builder import build_from_pretokenized
    from manticoresearch_tpu.schema import AttrDef, AttrType, Schema

    rng = np.random.RandomState(seed)
    lens = rng.randint(avg_len // 2, avg_len * 2, n_docs)
    offsets = np.zeros(n_docs + 1, np.int64)
    offsets[1:] = np.cumsum(lens)
    z = rng.zipf(1.25, int(offsets[-1]))
    terms = np.minimum(z - 1, vocab - 1).astype(np.int64)
    schema = Schema(fields=["content"],
                    attrs=[AttrDef("year", AttrType.UINT),
                           AttrDef("group_id", AttrType.UINT)])
    width = max(4, len(str(vocab - 1)))
    packed = build_from_pretokenized(
        schema,
        doc_ids=np.arange(1, n_docs + 1, dtype=np.int64),
        doc_terms=terms,
        doc_offsets=offsets,
        attrs={"year": 2000 + (np.arange(n_docs) % 25),
               "group_id": np.arange(n_docs) % 100},
        vocab=[f"t{i:0{width}d}" for i in range(vocab)],
    )
    return packed


def make_workload(rng, n_queries: int, vocab: int):
    """Mixed workload: 40% single term, 30% AND pair, 20% OR pair,
    10% AND + integer range filter (BASELINE configs 1-2)."""
    from manticoresearch_tpu.exec.searcher import SearchQuery
    from manticoresearch_tpu.query.planner import AttrFilterDef

    # mid-frequency terms: avoid both stop-word-like t00000 and singletons
    width = max(4, len(str(vocab - 1)))

    def term():
        return f"t{rng.randint(3, min(2000, vocab)):0{width}d}"

    out = []
    for i in range(n_queries):
        r = rng.rand()
        if r < 0.4:
            out.append(SearchQuery(match=term(), limit=10))
        elif r < 0.7:
            out.append(SearchQuery(match=f"{term()} {term()}", limit=10))
        elif r < 0.9:
            out.append(SearchQuery(match=f"{term()} | {term()}", limit=10))
        else:
            out.append(SearchQuery(
                match=f"{term()} {term()}",
                filters=[AttrFilterDef("year", "range_i", lo=2005, hi=2018)],
                limit=10))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--vocab", type=int, default=50_000)
    ap.add_argument("--avg-len", type=int, default=100)
    ap.add_argument("--queries", type=int, default=128)
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    # persistent compile cache: repeated bench runs (and degraded-tunnel
    # days) skip recompiling the ~10 plan shapes of the workload
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from manticoresearch_tpu.exec.searcher import SearchIndex

    t0 = time.perf_counter()
    packed = build_corpus(args.docs, args.vocab, args.avg_len)
    t_build = time.perf_counter() - t0
    idx = SearchIndex(packed)

    rng = np.random.RandomState(7)
    workload = make_workload(rng, args.queries, args.vocab)

    # warmup: compiles each plan shape once; steady state is what a serving
    # daemon sees (it batches concurrent queries into single launches)
    for r in idx.search_batch(workload):
        assert r.error is None, r.error

    # time-boxed measurement: up to 3 reps, but stop after ~60s so a
    # degraded accelerator link still produces a (slower) number instead
    # of blowing the harness timeout
    reps = 0
    t1 = time.perf_counter()
    while reps < 3:
        results = idx.search_batch(workload)
        reps += 1
        if time.perf_counter() - t1 > 60.0:
            break
    total = time.perf_counter() - t1

    qps = reps * len(workload) / total
    if args.verbose:
        import sys
        print(f"# build={t_build:.1f}s docs={args.docs} "
              f"postings={packed.n_postings} "
              f"batch={len(workload)} batch_time={total/reps*1000:.1f}ms",
              file=sys.stderr)

    print(json.dumps({
        "metric": "mixed_boolean_bm25_top10_qps_200k_docs",
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(qps / VS_BASELINE_QPS, 3),
    }))


if __name__ == "__main__":
    main()
