"""One-off: many-segment open/refresh/merge-plan scaling (round 6).

The pinned-read-schema commit (round 5) was motivated by 10k+-segment
catalogs, but the largest measured index was 16 segments.  This builds
a durable 256-segment index, then measures what a serving process
actually pays:

- open_segmented_tables wall time + SPARK JOB COUNT (must be O(1) per
  table — file-listing jobs — never O(segments));
- re-open (manifest refresh) wall;
- plan_merges wall over the 256-entry manifest (driver-side);
- one BM25 term query over the stitched 256-segment postings.

Writes JSON to /tmp/segments_scale.json.
"""
import json
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from toshi_spark.fixtures import synth_webtext
from toshi_spark.index.docmap import assign_doc_ids
from toshi_spark.index.merge import plan_merges
from toshi_spark.index.segments import (
    Manifest,
    build_segments,
    open_segmented_tables,
)
from toshi_spark.scoring import bm25_score, topk
from toshi_spark.session import get_spark

OUT = "/tmp/segments_scale.json"
IDX = "/tmp/toshi_spark_seg256"
N_DOCS = 64_000
N_SEGMENTS = 256

spark = get_spark("seg256", cores=32, shuffle_partitions=32)
sc = spark.sparkContext

res = {"n_docs": N_DOCS, "n_segments": N_SEGMENTS}

try:
    entries = Manifest(IDX).entries()
except Exception:
    entries = []
if len(entries) != N_SEGMENTS:
    shutil.rmtree(IDX, ignore_errors=True)
    corpus = assign_doc_ids(
        synth_webtext(spark, N_DOCS), order_col="url"
    ).persist()
    corpus.count()
    t0 = time.perf_counter()
    build_segments(spark, corpus, IDX, n_chunks=N_SEGMENTS,
                   index_name="s256", fingerprint="v1")
    res["build_sec"] = round(time.perf_counter() - t0, 1)
    corpus.unpersist()


def timed_open(tag: str):
    sc.setJobGroup(tag, tag)
    t0 = time.perf_counter()
    t = open_segmented_tables(spark, IDX)
    wall = time.perf_counter() - t0
    sc.setJobGroup("after_" + tag, "")
    jobs = sc.statusTracker().getJobIdsForGroup(tag)
    return t, round(wall, 3), len(jobs)


tables, res["open_sec"], res["open_jobs"] = timed_open("open256_cold")
_, res["reopen_sec"], res["reopen_jobs"] = timed_open("open256_warm")

t0 = time.perf_counter()
entries = Manifest(IDX).entries()
groups = plan_merges(entries)
res["merge_plan_sec"] = round(time.perf_counter() - t0, 4)
res["merge_groups"] = len(groups)

t0 = time.perf_counter()
m = tables.postings.filter(
    (F.col("field") == "text") & (F.col("term") == "w40")
).select("field", "term", "doc_id", "tf", "doc_len")
scored = bm25_score(m, tables.doclens, tables.termstats, tables.n_docs,
                    tables.fieldstats, tf_mode="full",
                    unique_doc_terms=True)
rows = topk(scored, 10).collect()
res["term_query_sec"] = round(time.perf_counter() - t0, 3)
res["term_query_rows"] = len(rows)

print(json.dumps(res))
with open(OUT, "w") as f:
    json.dump(res, f)
