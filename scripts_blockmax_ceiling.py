"""Measure the block-granularity pruning CEILING per query shape.

Round-4 VERDICT #9 asked whether an intersection-aware pre-pass over
block doc-range overlaps could make mid+mid unions prunable.  Two of
its three ingredients already exist (`blockmax._overlap_rest` bounds
each block's rest-of-query by its overlapping partner blocks;
`_block_bounds` seeds the θ decode with the best JOINT-bound block
plus its overlapping partners per other term).  What no θ-side trick
can change is the SURVIVOR TEST itself: a block is decodable only via

    keep(b)  ⇔  ub(b) + overlap_rest_ub(b) >= θ

and the largest sound θ any scheme — intersection-aware or otherwise —
can ever reach is θ* = the true k-th total score (θ > θ* would prune a
top-k doc).  So

    prune_ceiling(shape) = pruned fraction at θ = θ*

is a hard upper bound on what ANY threshold-discovery improvement
(conjunction pre-passes included) could deliver at block granularity
with these bounds.  This script measures it on the same site-skewed
corpus as the bench matrix, next to what the shipped seed-θ actually
achieves and what the adaptive gate estimated.

Usage:  python scripts_blockmax_ceiling.py  [n_docs]
Prints one JSON line per shape + a summary line.
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import functions as F

from toshi_spark.fixtures import synth_webtext_skewed
from toshi_spark.index.blocks import encode_blocks_df
from toshi_spark.index.builder import build_index, salted_postings
from toshi_spark.index.docmap import assign_doc_ids
from toshi_spark.query import blockmax as bm
from toshi_spark.scoring import bm25_score, topk
from toshi_spark.session import get_spark

SHAPES = {
    "stopword": ["w0"],
    "stop+stop": ["w0", "w1"],
    "stop+mid": ["w0", "w97"],
    "stop+mid+rare": ["w0", "w97", "w1497"],
    "mid+mid": ["w97", "w99"],
}
K = 20


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    spark = get_spark("blockmax_ceiling", cores=8)
    corpus = assign_doc_ids(
        synth_webtext_skewed(spark, n_docs, seed=42), order_col="url"
    )
    ix = build_index(corpus, id_col="doc_id", text_fields="text")
    salted = salted_postings(ix.postings, ix.termstats,
                             df_threshold=n_docs // 4, n_salts=4)
    avgdl_map = {r["field"]: float(r["avgdl"])
                 for r in ix.fieldstats.collect()}
    blocks = encode_blocks_df(salted, avgdl_map).repartition(8).persist()
    blocks.count()
    avgdl = bm._avgdl_for(ix.fieldstats, "text")

    results = {}
    for label, terms in SHAPES.items():
        # θ*: the true k-th total score — the sound-θ maximum
        matched = ix.postings.filter(F.col("term").isin(terms))
        scored = topk(
            bm25_score(matched, ix.doclens, ix.termstats, ix.n_docs,
                       ix.fieldstats),
            K,
        ).collect()
        theta_star = float(scored[-1]["score"])

        meta, tau, ub_others, dfs, seed_keys, meta_rows, rest_arr = (
            bm._block_bounds(blocks, ix.termstats, ix.n_docs, "text",
                             terms, K, avgdl)
        )
        assert meta_rows is not None, "ceiling needs the collect path"
        import numpy as np

        cnt = np.array([r["count"] for r in meta_rows], dtype=np.float64)
        total = float(cnt.sum())

        def pruned_at(theta: float) -> float:
            keep = bm._survival_mask(meta_rows, rest_arr, theta)
            return float(cnt[~keep].sum()) / total

        # what the shipped plan achieves (gate + seed-θ as deployed)
        theta_ship = bm._seed_theta(meta, seed_keys, dfs, ix.n_docs,
                                    avgdl, K, tau, "full")
        results[label] = {
            "theta_star": round(theta_star, 4),
            "theta_shipped": round(theta_ship, 4),
            "gate_ran_seed": seed_keys is not None,
            "pruned_at_theta_star_pct": round(
                100 * pruned_at(theta_star - bm._BOUND_GUARD), 1),
            "pruned_shipped_pct": round(100 * pruned_at(theta_ship), 1),
        }
        print(json.dumps({label: results[label]}), flush=True)

    print(json.dumps({"metric": "blockmax prune ceiling at true kth "
                                "score vs shipped",
                      "n_docs": n_docs, "k": K, "shapes": results}))
    blocks.unpersist()


if __name__ == "__main__":
    main()
