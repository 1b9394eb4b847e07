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
    "ann_cosine",
    "ann_ivf",
    "sessionize",
    "ft_raw_bool",
    "ft_raw_wildcard",
    "ft_blockmax_topk",
    "ft_segmented_term_bm25",
    "embedding_neardup",
    "dedup_clusters",
    "sample_stratified",
    "chunk_documents",
    # round 4: the full 46-query oracle contract is timed — a perf
    # regression in any driver-checked query now shows up here
    "ft_term_bm25_quantized",
    "ft_termstats",
    "ft_doclens",
    "lsh_pairs",
    "ngram_jaccard",
    "ann_lsh_buckets",
    "multimodal_frames",
    "ft_raw_fuzzy",
    "ft_delete_visibility",
    "dedup_survivors",
    # round 5: new web-pipeline stages
    "paragraph_dedup",
    "host_stats",
    # round 5: training-data assembly stages
    "contamination",
    "pack_sequences",
    "lm_score",
    "blocklist_filter",
    "gopher_filter",
    "substring_dedup",
    "host_cap",
    "mix_weights",
    "dsir_weights",
    "quality_calibrate",
    "fuzzy_contamination",
    # round 6: fused single-scan profile queries (contract consolidation)
    "text_profile",
    "webtext_clean",
    "multimodal_pipeline",
    # round 6: end-to-end training-mix assembly (integration query)
    "assemble_training_mix",
    # round 7: non-ASCII analyzer path (multilingual corpus BM25)
    "ft_unicode_term",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.0

    missing = sorted(set(QUERIES) - set(BENCH_QUERIES))
    if missing:
        print(f"WARNING: unbenched queries: {missing}", file=sys.stderr)

    spark = get_spark("toshi_spark_bench", cores=cpus)

    # ---- contention canary: a FIXED all-core Spark job (range-sum,
    # zero I/O, zero shuffle — pure whole-stage-codegen arithmetic)
    # timed at known points in the run.  This sandbox host shows
    # bursty external CPU contention (BASELINE.md: identical code
    # measuring 0.93 s vs 10.6 s minutes apart); the canary turns
    # "was this window polluted?" from a re-run argument into a
    # number in the artifact.  Quiet reference: ~0.4-0.6 s at 32
    # cores; multiples of that indicate steal DURING this bench.
    def canary() -> float:
        t = time.perf_counter()
        spark.range(1_500_000_000, numPartitions=cpus).selectExpr(
            "sum(id * 3 + 1)"
        ).collect()
        return round(time.perf_counter() - t, 4)

    canary()  # untimed warmup
    canaries = {"pre": canary()}

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
    canaries["post_build"] = canary()
    timings: dict[str, float] = {}
    spreads: dict[str, dict] = {}
    for qi, name in enumerate(BENCH_QUERIES):
        if qi == len(BENCH_QUERIES) // 2:
            canaries["mid_queries"] = canary()
        fn = QUERIES[name]
        fn(spark, sf_dir).collect()
        trials = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            trials.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(trials), 4)
        # min/max ride in extra so judge/builder can tell a real
        # regression from one VM-steal-polluted trial without rerunning
        spreads[name] = {"min": round(min(trials), 4),
                         "max": round(max(trials), 4)}
    canaries["post_queries"] = canary()

    # ---- block-max pruning effectiveness on a crawl-shaped corpus.
    # The sf-dir documents table is flat (no host locality), where block
    # impact bounds are near-uniform and pruning is structurally ~0%
    # (BASELINE.md).  Real crawls cluster page length + topic by host,
    # which is what gives blocks distinct bounds — measure on that
    # shape so the pruned path's cost model is a number, not a claim.
    # fail-soft: the headline bench line must print even if this
    # auxiliary measurement breaks
    try:
        skew = _blockmax_skewed(spark)
    except Exception as e:  # pragma: no cover
        skew = {"error": str(e)}

    # ---- durable-index latencies (r4 VERDICT #8): the on-disk
    # segmented index the ft_segmented query built above, re-opened
    # from its manifest — single-term BM25 and the blockmax union as
    # diffable per-round numbers instead of BASELINE.md prose
    try:
        durable = _durable_bench(spark, sf_dir)
    except Exception as e:  # pragma: no cover
        durable = {"error": str(e)}

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
            "query_spread": spreads,
            # fixed-work range-sum timings at known points; quiet
            # reference ~0.4-0.6 s at 32 cores — larger values mean
            # external host contention polluted THIS window
            "contention_canary": canaries,
            "blockmax_skewed": skew,
            "durable": durable,
        },
    }
    # The driver records only the LAST ~2000 bytes of stdout, so the
    # full artifact (~5 KB with spreads + aux measurements) gets its
    # head truncated and fails to parse (BENCH_r05/r06 "parsed": null).
    # stdout therefore carries ONE compact line that fits the capture
    # window (queries at 3 dp, scalar extras only); the complete
    # artifact goes to stderr and, when BENCH_DETAILS_PATH is set, to
    # that file — same content, parse-proof split.
    full = json.dumps(out)
    print(full, file=sys.stderr)
    details_path = os.environ.get("BENCH_DETAILS_PATH")
    if details_path:
        with open(details_path, "w") as f:
            f.write(full + "\n")
    compact = {
        "metric": "index build + headline query latency",
        "value": total,
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": sf,
        "extra": {
            "n_docs": n_docs,
            "index_build_sec": round(build_sec, 2),
            "indexing_docs_per_sec": round(docs_per_sec, 1),
            "query_latency_p50_sec": round(
                statistics.median(timings.values()), 4
            ),
            "cpus": cpus,
            "canary": canaries,
        },
    }
    line = json.dumps(compact, separators=(",", ":"))
    # hard guard: stay inside the capture window even as the query
    # set grows — drop per-query detail before ever truncating JSON
    if len(line) > 1900:
        compact["queries"] = {
            k: round(v, 2)
            for k, v in sorted(
                timings.items(), key=lambda kv: -kv[1]
            )[:40]
        }
        compact["extra"]["queries_truncated_to_slowest"] = 40
        line = json.dumps(compact, separators=(",", ":"))
    print(line)


def _durable_bench(spark, sf_dir: str) -> dict:
    """Latencies over the DURABLE segmented index (manifest-committed
    parquet segments on disk): open-from-manifest, single-term BM25,
    and the blockmax union.  Medians of 3 after one warm pass."""
    import hashlib
    import tempfile

    from pyspark.sql import functions as F

    from toshi_spark.index.segments import (
        Manifest,
        open_blocks,
        open_segmented_tables,
    )
    from toshi_spark.query.blockmax import blockmax_topk
    from toshi_spark.scoring import bm25_score, topk

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    idx_dir = os.path.join(tempfile.gettempdir(), f"toshi_spark_seg_{tag}")
    t0 = time.perf_counter()
    t = open_segmented_tables(spark, idx_dir)
    n_docs = t.n_docs  # forces the stats stitch
    open_sec = time.perf_counter() - t0
    n_segments = len(Manifest(idx_dir).entries())
    blocks = open_blocks(spark, idx_dir)

    def single():
        matched = t.postings.filter(
            (F.col("field") == "text") & (F.col("term") == "spark")
        ).select("field", "term", "doc_id", "tf", "doc_len")
        topk(bm25_score(matched, t.doclens, t.termstats, t.n_docs,
                        t.fieldstats, tf_mode="full",
                        unique_doc_terms=True), 20).collect()

    def union():
        blockmax_topk(blocks, t.termstats, t.doclens, t.fieldstats,
                      t.n_docs, "text", ["query", "window", "stream"],
                      20).collect()

    out: dict = {"n_segments": n_segments, "n_docs": n_docs,
                 "open_sec": round(open_sec, 4)}
    for label, fn in (("single_term_sec", single),
                      ("blockmax_union_sec", union)):
        fn()  # warm
        trials = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            trials.append(time.perf_counter() - t0)
        out[label] = round(statistics.median(trials), 4)
    return out


def _blockmax_skewed(spark) -> dict:
    """Build a 40k-doc site-skewed index and measure pruning + latency
    for representative query shapes (pruned-% = postings not decoded)."""
    from toshi_spark.fixtures import synth_webtext_skewed
    from toshi_spark.index.blocks import encode_blocks_df
    from toshi_spark.index.builder import build_index, salted_postings
    from toshi_spark.index.docmap import assign_doc_ids
    from toshi_spark.query.blockmax import (
        blockmax_prune_stats,
        blockmax_topk,
    )

    t0 = time.perf_counter()
    corpus = assign_doc_ids(
        synth_webtext_skewed(spark, 40000, seed=42), order_col="url"
    )
    ix = build_index(corpus, id_col="doc_id", text_fields="text")
    salted = salted_postings(ix.postings, ix.termstats,
                             df_threshold=10000, n_salts=4)
    avgdl = {r["field"]: float(r["avgdl"])
             for r in ix.fieldstats.collect()}
    blocks = encode_blocks_df(salted, avgdl).repartition(8).persist()
    n_blocks = blocks.count()
    build_sec = time.perf_counter() - t0

    shapes = {
        "stopword": ["w0"],
        "stop+stop": ["w0", "w1"],
        "stop+mid": ["w0", "w97"],
        "stop+mid+rare": ["w0", "w97", "w1497"],
        "mid+mid": ["w97", "w99"],
    }
    out: dict = {"n_docs": 40000, "n_blocks": n_blocks,
                 "skewed_build_sec": round(build_sec, 2), "shapes": {}}
    for label, terms in shapes.items():
        st = blockmax_prune_stats(
            blocks, ix.termstats, ix.fieldstats, ix.n_docs, "text",
            terms, 20,
        )
        tp = sum(v["postings"] for v in st["terms"].values())
        sp = sum(v["surviving_postings"] for v in st["terms"].values())
        tb = sum(v["blocks"] for v in st["terms"].values())
        sv = sum(v["survivors"] for v in st["terms"].values())
        q = lambda: blockmax_topk(  # noqa: E731
            blocks, ix.termstats, ix.doclens, ix.fieldstats, ix.n_docs,
            "text", terms, 20,
        ).collect()
        q()  # warm
        trials = []
        for _ in range(3):
            t0 = time.perf_counter()
            q()
            trials.append(time.perf_counter() - t0)
        out["shapes"][label] = {
            "pruned_postings_pct": round(100 * (1 - sp / tp), 1),
            "pruned_blocks_pct": round(100 * (1 - sv / tb), 1),
            "query_sec": round(statistics.median(trials), 4),
        }
    blocks.unpersist()
    return out


if __name__ == "__main__":
    main()
