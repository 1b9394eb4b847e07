"""One-off: exercise merge compaction at 500k-doc scale.

Builds a durable 16-segment index over synth_webtext(500k), runs the
log-merge policy (16 × ~31k-doc segments share one log-size bucket →
one compaction into a single segment), and measures: build wall,
merge wall, and a BM25 term query + block-max union before vs after
(latency + identical top-k). Writes JSON to /tmp/merge_bench.json.
"""
import json
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from toshi_spark.fixtures import synth_webtext
from toshi_spark.index.docmap import assign_doc_ids
from toshi_spark.index.merge import run_merge
from toshi_spark.index.segments import (
    Manifest,
    build_segments,
    open_blocks,
    open_segmented_tables,
)
from toshi_spark.query.blockmax import blockmax_topk
from toshi_spark.scoring import bm25_score, topk
from toshi_spark.session import get_spark

OUT = "/tmp/merge_bench.json"
IDX = "/tmp/toshi_spark_merge_bench"
N = 500_000

spark = get_spark("merge_bench", cores=32, shuffle_partitions=32)
shutil.rmtree(IDX, ignore_errors=True)

# persist: build_segments scans the corpus once per chunk — without
# the cache that would re-run the synthetic generator 16 times
corpus = assign_doc_ids(synth_webtext(spark, N), order_col="url").persist()
corpus.count()
t0 = time.perf_counter()
entries = build_segments(spark, corpus, IDX, n_chunks=16,
                         index_name="mb", fingerprint="v1")
build_sec = time.perf_counter() - t0

res = {"n_docs": N, "n_segments_before": len(entries),
       "build_sec": round(build_sec, 1),
       "docs_per_sec": round(N / build_sec, 1)}


def run_queries(tag):
    tables = open_segmented_tables(spark, IDX)
    blocks = open_blocks(spark, IDX)
    out = {}
    # single term BM25 over postings parquet
    for name, terms in [("term_w40", ["w40"]),
                        ("union_w0_w7_w300", ["w0", "w7", "w300"])]:
        t0 = time.perf_counter()
        m = tables.postings.filter(F.col("term").isin(terms))
        rows = topk(
            bm25_score(m, tables.doclens, tables.termstats,
                       tables.n_docs, tables.fieldstats),
            10,
        ).collect()
        out[name] = {
            "sec": round(time.perf_counter() - t0, 2),
            "top": [(r.doc_id, round(r.score, 6)) for r in rows],
        }
    t0 = time.perf_counter()
    rows = blockmax_topk(
        blocks, tables.termstats, tables.doclens, tables.fieldstats,
        tables.n_docs, "text", ["w0", "w7", "w300"], 10,
    ).collect()
    out["blockmax_union"] = {
        "sec": round(time.perf_counter() - t0, 2),
        "top": [(r.doc_id, round(r.score, 6)) for r in rows],
    }
    res[tag] = out


run_queries("pre_merge")

t0 = time.perf_counter()
merged = run_merge(spark, IDX, min_merge_size=8, index_name="mb")
res["merge_sec"] = round(time.perf_counter() - t0, 1)
res["merged_ids"] = merged
res["n_segments_after"] = len(Manifest(IDX).entries())

run_queries("post_merge")
res["rank_identical_post_merge"] = all(
    res["pre_merge"][q]["top"] == res["post_merge"][q]["top"]
    for q in res["pre_merge"]
)

with open(OUT, "w") as f:
    json.dump(res, f, indent=1)
print(json.dumps(res, indent=1))
