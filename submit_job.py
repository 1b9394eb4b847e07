"""spark-submit entry point: build an index and run the flagship query.

The north-rule deployment shape:

    zip -r toshi_spark.zip toshi_spark
    spark-submit --master local[8] --py-files toshi_spark.zip \\
        submit_job.py <corpus_path_or_n_docs> <index_dir> <query_term>

With a numeric first arg the job synthesizes that many webtext docs
(deterministic, seed 42); with a path it loads the corpus via
sources.load_webtext.  Builds durable segments (resumable), then runs
a BM25 term query over the committed index and prints the top-10 as
one JSON line.
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession, functions as F


def main() -> None:
    src, index_dir, term = sys.argv[1], sys.argv[2], sys.argv[3]
    spark = SparkSession.builder.appName("toshi_spark_submit").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    # imports resolve from --py-files (or the repo dir when run locally)
    from toshi_spark.fixtures import synth_webtext
    from toshi_spark.index.docmap import assign_doc_ids
    from toshi_spark.index.segments import build_segments, open_segmented_tables
    from toshi_spark.scoring import bm25_score, topk
    from toshi_spark.sources import load_webtext

    if src.isdigit():
        corpus = synth_webtext(spark, int(src), seed=42)
    else:
        corpus = load_webtext(spark, src)
    corpus = assign_doc_ids(corpus, order_col="url")

    entries = build_segments(
        spark, corpus, index_dir, id_col="doc_id", text_fields="text",
        n_chunks=2, index_name="submit", fingerprint=src,
    )
    t = open_segmented_tables(spark, index_dir)
    matched = t.postings.filter(
        (F.col("field") == "text") & (F.col("term") == term)
    ).select("field", "term", "doc_id", "tf")
    scored = bm25_score(matched, t.doclens, t.termstats, t.n_docs,
                        t.fieldstats, tf_mode="full")
    hits = [
        {"doc_id": r.doc_id, "score": round(r.score, 4)}
        for r in topk(scored, 10).collect()
    ]
    print(json.dumps({
        "indexed_docs": sum(e.docs for e in entries),
        "segments": [e.segment_id for e in entries],
        "term": term,
        "top10": hits,
    }))


if __name__ == "__main__":
    main()
