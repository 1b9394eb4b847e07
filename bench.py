"""Benchmark harness: one JSON line on stdout.

Measures (a) inverted-index build throughput (docs/sec) over the
sf-dir documents table, (b) per-query latency for the headline query
set, at local[$SPARK_GRAFT_CPUS] over $SPARK_GRAFT_SF_DIR.

Output: {"metric": ..., "value": <total seconds>, "unit": "sec",
         "queries": {name: sec}, "sf": ..., "extra": {...}}
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from toshi_spark.queries import QUERIES, get_index  # noqa: E402
from toshi_spark.session import get_spark  # noqa: E402

BENCH_QUERIES = [
    "ft_term_bm25",
    "ft_term_basic",
    "ft_term_union_bm25",
    "ft_phrase",
    "ft_bool",
    "ft_range",
    "ft_fuzzy",
    "ft_regex",
    "ft_all_sorted",
    "ft_facets",
    "dedup_exact",
    "token_count",
    "ann_cosine",
    "ann_ivf",
    "sessionize",
    "ft_raw_bool",
    "ft_raw_wildcard",
    "ft_blockmax_topk",
    "ft_segmented_term_bm25",
    "minhash_signatures",
    "embedding_neardup",
    "quality",
    "lang_id",
    "fingerprint",
    "simhash",
    "extract_text",
    "multimodal_decode",
    "dedup_clusters",
    "sample_stratified",
    "repetition",
    "pii_scrub",
    "boilerplate_strip",
    "chunk_documents",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.0

    spark = get_spark("toshi_spark_bench", cores=cpus)

    # ---- index build throughput (analyze + postings + stats materialize)
    t0 = time.perf_counter()
    ix = get_index(spark, sf_dir)
    n_docs = ix.n_docs
    # force full materialization of the index tables
    n_postings = ix.postings.count()
    ix.doclens.count()
    ix.termstats.count()
    build_sec = time.perf_counter() - t0
    docs_per_sec = n_docs / build_sec if build_sec > 0 else 0.0

    # ---- query latencies: one untimed warmup (JIT + python worker
    # spin-up), then the MEDIAN of three timed runs — this sandbox VM
    # shows ~2x run-to-run noise under hypervisor CPU steal (documented
    # in BASELINE.md), so a single sample is not a serving metric
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = QUERIES[name]
        fn(spark, sf_dir).collect()
        trials = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            trials.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(trials), 4)

    total = round(build_sec + sum(timings.values()), 4)
    out = {
        "metric": (
            "index build + headline query latency "
            "(toshi_spark inverted index, BM25 k1=1.2 b=0.75)"
        ),
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "extra": {
            "n_docs": n_docs,
            "n_postings": n_postings,
            "index_build_sec": round(build_sec, 4),
            "indexing_docs_per_sec": round(docs_per_sec, 2),
            "query_latency_p50_sec": round(
                statistics.median(timings.values()), 4
            ),
            "cpus": cpus,
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
