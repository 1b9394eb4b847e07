"""Doc-sharded postings at 1M docs: phrase/bool latency vs the default
layout (round-7; follows up scripts_phrase_1m.py, which measured the
doc_id exchange as the phrase premium).

Same corpus, same durable ingest, same query shapes and timing
protocol as scripts_phrase_1m.py; after the baseline arm, the index
writes its doc-sharded copy (index/bucketed.py — one write-time
shuffle) and the identical queries re-run on the exchange-free plans.
Results are verified row-identical between the arms.

Usage: python scripts_phrase_bucketed.py [n_docs]   (default 1,000,000)
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

SHAPES = {
    # head+head: the worst position volume
    "phrase_w0_w1": {"query": {"phrase": {"text": {"terms": ["w0", "w1"]}}},
                     "limit": 100},
    # head+mid: the common real shape
    "phrase_w0_w97": {"query": {"phrase": {"text": {"terms": ["w0", "w97"]}}},
                      "limit": 100},
    # three terms
    "phrase_w0_w1_w2": {"query": {"phrase": {"text":
                        {"terms": ["w0", "w1", "w2"]}}}, "limit": 100},
    # fused bool: same doc_id-grouping shape, no positions
    "bool_must2_not1": {"query": {"bool": {
        "must": [{"term": {"text": "w0"}}, {"term": {"text": "w97"}}],
        "must_not": [{"term": {"text": "w91"}}],
    }}, "limit": 100},
}


def _measure(ix, arm: str) -> dict:
    out = {}
    for label, spec in SHAPES.items():
        search = parse_search(spec)

        def run():
            return ix.search_df(search).collect()

        rows = run()  # warm
        trials = []
        for _ in range(3):
            t1 = time.perf_counter()
            run()
            trials.append(time.perf_counter() - t1)
        out[label] = {
            "hits": len(rows),
            "rows": sorted((r["doc_id"], round(r["score"], 4))
                           for r in rows),
            "sec": round(statistics.median(trials), 3),
            "spread": [round(min(trials), 3), round(max(trials), 3)],
        }
        print(f"  [{arm}] {label}: {out[label]['sec']} s "
              f"({out[label]['hits']} hits)", file=sys.stderr)
    return out


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark("phrase_bucketed", cores=32)
    base = tempfile.mkdtemp(prefix="toshi_spark_docb_")
    try:
        cat = IndexCatalog(spark, base)
        cat.create_index("pb", [
            {"name": "text", "ftype": "text", "stored": False,
             "indexed": True},
        ], merge_policy={"kind": "none"})
        corpus = assign_doc_ids(
            synth_webtext(spark, n_docs, seed=42), order_col="url"
        ).select("doc_id", "text")
        t0 = time.perf_counter()
        cat.ingest("pb", corpus, n_chunks=4, fingerprint="pb")
        build_sec = time.perf_counter() - t0
        ix = cat.open("pb")

        default_arm = _measure(ix, "default")

        t0 = time.perf_counter()
        ix.enable_doc_bucketed(base + "/docb", n_term_partitions=32,
                               n_buckets=64)
        docb_write_sec = time.perf_counter() - t0
        bucketed_arm = _measure(ix, "doc-sharded")

        mismatched = [k for k in SHAPES
                      if default_arm[k]["rows"] != bucketed_arm[k]["rows"]]
        for arm in (default_arm, bucketed_arm):
            for v in arm.values():
                del v["rows"]
        out = {
            "n_docs": n_docs,
            "build_sec": round(build_sec, 1),
            "docb_write_sec": round(docb_write_sec, 1),
            "identical_results": not mismatched,
            "mismatched": mismatched,
            "default": default_arm,
            "doc_sharded": bucketed_arm,
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
