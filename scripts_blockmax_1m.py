"""Block-max pruning matrix at VOLUME (round-7, VERDICT r6 #4).

The skewed pruning matrix (bench.py `_blockmax_skewed`) is measured at
40k docs; the scale claim — constant-size seed collect, pruning that
holds as postings grow — deserves a volume point.  This script runs
the SAME shapes on a 1M-doc site-skewed corpus (25× the matrix, ~10×
the round-1 durable index's postings) and verifies each shape's
block-max top-k is RANK-IDENTICAL to the full-decode BM25 reference.

Usage: python scripts_blockmax_1m.py [n_docs]   (default 1,000,000)
Prints one JSON line.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

from pyspark.sql import functions as F

from toshi_spark.fixtures import synth_webtext_skewed
from toshi_spark.index.blocks import encode_blocks_df
from toshi_spark.index.builder import build_index, salted_postings
from toshi_spark.index.docmap import assign_doc_ids
from toshi_spark.query.blockmax import blockmax_prune_stats, blockmax_topk
from toshi_spark.scoring import bm25_score, topk
from toshi_spark.session import get_spark

SHAPES = {
    "stopword": ["w0"],
    "stop+stop": ["w0", "w1"],
    "stop+mid": ["w0", "w97"],
    "stop+mid+rare": ["w0", "w97", "w1497"],
    "mid+mid": ["w97", "w99"],
}


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark("blockmax_1m", cores=32)
    t0 = time.perf_counter()
    corpus = assign_doc_ids(
        synth_webtext_skewed(spark, n_docs, seed=42), order_col="url"
    )
    ix = build_index(corpus, id_col="doc_id", text_fields="text")
    n_postings = ix.postings.count()
    salted = salted_postings(ix.postings, ix.termstats,
                             df_threshold=10000, n_salts=4)
    avgdl = {r["field"]: float(r["avgdl"]) for r in ix.fieldstats.collect()}
    blocks = encode_blocks_df(salted, avgdl).repartition(32).persist()
    n_blocks = blocks.count()
    build_sec = time.perf_counter() - t0

    out: dict = {
        "n_docs": n_docs, "n_postings": n_postings, "n_blocks": n_blocks,
        "build_sec": round(build_sec, 1), "shapes": {},
    }
    for label, terms in SHAPES.items():
        st = blockmax_prune_stats(
            blocks, ix.termstats, ix.fieldstats, ix.n_docs, "text",
            terms, 20,
        )
        tp = sum(v["postings"] for v in st["terms"].values())
        sp = sum(v["surviving_postings"] for v in st["terms"].values())

        def bq():
            return blockmax_topk(
                blocks, ix.termstats, ix.doclens, ix.fieldstats,
                ix.n_docs, "text", terms, 20,
            ).collect()

        bq()  # warm
        trials = []
        for _ in range(3):
            t1 = time.perf_counter()
            got = bq()
            trials.append(time.perf_counter() - t1)
        # rank-identity vs full decode (same scoring path the ft_*
        # oracles attest at sf scale)
        matched = ix.postings.filter(
            (F.col("field") == "text") & F.col("term").isin(terms)
        )
        ref = topk(
            bm25_score(matched, ix.doclens, ix.termstats, ix.n_docs,
                       ix.fieldstats),
            20,
        ).collect()
        rank_ok = (
            [r.doc_id for r in got] == [r.doc_id for r in ref]
            and all(abs(a.score - b.score) < 1e-3
                    for a, b in zip(got, ref))
        )
        out["shapes"][label] = {
            "pruned_postings_pct": round(100 * (1 - sp / tp), 1),
            "blockmax_query_sec": round(statistics.median(trials), 3),
            "rank_identical_to_full_decode": rank_ok,
        }
    blocks.unpersist()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
