"""Durable-index phrase latency at 1M docs (round-7, VERDICT r6 #9).

ft_phrase at sf0.1 pays one doc_id exchange on position-bearing rows
(~1.1-1.2 s); the open question was whether that groupBy dominates at
volume.  This script builds the 1M-doc durable index through the
catalog (segments + manifest on disk), opens it cold, and times a
two-term phrase query over the stitched postings — the number that
decides whether segment-format v5 needs pre-grouped per-doc position
maps.

Usage: python scripts_phrase_1m.py [n_docs]   (default 1,000,000)
Prints one JSON line.
"""

from __future__ import annotations

import json
import shutil
import statistics
import sys
import tempfile
import time

from toshi_spark.fixtures import synth_webtext
from toshi_spark.index.catalog import IndexCatalog
from toshi_spark.index.docmap import assign_doc_ids
from toshi_spark.query.dsl import parse_search
from toshi_spark.session import get_spark


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark("phrase_1m", cores=32)
    base = tempfile.mkdtemp(prefix="toshi_spark_phrase1m_")
    try:
        cat = IndexCatalog(spark, base)
        cat.create_index("p1m", [
            {"name": "text", "ftype": "text", "stored": False,
             "indexed": True},
        ], merge_policy={"kind": "none"})
        corpus = assign_doc_ids(
            synth_webtext(spark, n_docs, seed=42), order_col="url"
        ).select("doc_id", "text")
        t0 = time.perf_counter()
        cat.ingest("p1m", corpus, n_chunks=4, fingerprint="p1m")
        build_sec = time.perf_counter() - t0

        t0 = time.perf_counter()
        ix = cat.open("p1m")
        open_sec = time.perf_counter() - t0

        out = {"n_docs": n_docs, "build_sec": round(build_sec, 1),
               "open_sec": round(open_sec, 2), "queries": {}}
        shapes = {
            # head+head: the worst position volume
            "phrase_w0_w1": ["w0", "w1"],
            # head+mid: the common real shape
            "phrase_w0_w97": ["w0", "w97"],
            # three terms
            "phrase_w0_w1_w2": ["w0", "w1", "w2"],
        }
        for label, terms in shapes.items():
            search = parse_search(
                {"query": {"phrase": {"text": {"terms": terms}}},
                 "limit": 100}
            )

            def run():
                return ix.search_df(search).collect()

            rows = run()  # warm
            trials = []
            for _ in range(3):
                t1 = time.perf_counter()
                run()
                trials.append(time.perf_counter() - t1)
            out["queries"][label] = {
                "hits": len(rows),
                "sec": round(statistics.median(trials), 3),
                "spread": [round(min(trials), 3), round(max(trials), 3)],
            }
        # reference point: single-term BM25 on the same open handle
        from pyspark.sql import functions as F

        from toshi_spark.scoring import bm25_score, topk

        def term_q():
            m = ix.postings.filter(
                (F.col("field") == "text") & (F.col("term") == "w97")
            )
            return topk(
                bm25_score(m, ix.doclens, ix.termstats, ix.n_docs,
                           ix.fieldstats, tf_mode="full",
                           unique_doc_terms=True),
                10,
            ).collect()

        term_q()
        trials = []
        for _ in range(3):
            t1 = time.perf_counter()
            term_q()
            trials.append(time.perf_counter() - t1)
        out["queries"]["term_w97_bm25"] = {
            "sec": round(statistics.median(trials), 3),
            "spread": [round(min(trials), 3), round(max(trials), 3)],
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
