"""Block-max two-phase top-k over the compressed block table.

Spark rendition of Tantivy 0.19's BlockWAND (engaged by the plain
``TopDocs`` collector the reference uses, ``handle.rs:94`` — SURVEY.md
§4 pins this as an explicit requirement).  Sequential WAND does not
map to a distributed engine, so we use a sound two-phase plan:

  phase 0  rank block metadata by per-block upper bound
             ub(block) = idf(term) · (k1+1)·max_tf / (max_tf + k1·(1−b))
           (the doclen→0 bound: tf_norm is maximized as dl→0) and
           decode just enough of the best blocks to cover k docs;
           their exact kth score is a LOWER bound τ on the final kth
           score (underestimates are sound — they only reduce pruning).
  phase 1  keep blocks whose optimistic total
             ub(block) + Σ_{t'≠t} max_ub(t')
           can still reach τ; decode + score only those; union with
           the phase-0 blocks; exact BM25; global top-k.

Soundness: a doc only in pruned blocks has, for each query term t it
matches, block ub below the survivor line, so its total score
< τ ≤ kth exact score — it cannot enter the top-k.  Ties survive
because the filter is ``>=``.

Everything is DataFrame algebra + the Arrow block decoder; block
metadata never funnels through the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .. import B, K1
from ..index.blocks import decode_blocks_df
from ..scoring import bm25_score, idf_col, topk


def _with_ub(blocks: DataFrame, termstats: DataFrame, n_docs: int) -> DataFrame:
    """Attach the per-block BM25 upper bound."""
    joined = blocks.join(termstats.select("field", "term", "df"), ["field", "term"])
    max_tf = F.col("max_tf").cast("double")
    tf_norm_ub = max_tf * F.lit(K1 + 1.0) / (max_tf + F.lit(K1 * (1.0 - B)))
    return joined.withColumn(
        "ub", idf_col(n_docs, F.col("df").cast("double")) * tf_norm_ub
    )


def blockmax_topk(
    blocks: DataFrame,
    termstats: DataFrame,
    doclens: DataFrame,
    fieldstats: DataFrame,
    n_docs: int,
    field: str,
    terms: list[str],
    k: int,
    tf_mode: str = "full",
) -> DataFrame:
    """Top-k BM25 over a union-of-terms query using block-max pruning."""
    spark = blocks.sparkSession
    cand = blocks.filter(
        (F.col("field") == field) & F.col("term").isin(list(terms))
    )
    # block identity key: within one segment (field,term,salt,block_id)
    # is unique; multi-segment block tables carry a 'seg' column
    block_key = [
        c for c in ("seg", "field", "term", "salt", "block_id")
        if c in blocks.columns
    ]
    meta = _with_ub(cand, termstats, n_docs).persist()

    def score_blocks(bdf: DataFrame) -> DataFrame:
        decoded = decode_blocks_df(
            bdf.select(
                "field", "term", "salt", "block_id", "first_doc", "last_doc",
                "count", "max_tf", "doc_deltas", "tfs",
            )
        )
        return bm25_score(
            decoded, doclens, termstats, n_docs, fieldstats, tf_mode=tf_mode
        )

    # ---- phase 0: τ from the best blocks (enough to cover k docs).
    # τ is a 1-row aggregate carried as a BROADCAST subplan (crossJoin)
    # into the survivor filter — the whole two-phase query is ONE Spark
    # action with ZERO driver collects; the fewer-than-k case folds in
    # as the (m < k) disjunct, which passes every block.
    n_seed_blocks = max(1, (k // 64) + 1)  # ≥ k postings at 128/block
    seed = (
        meta.orderBy(F.col("ub").desc(), F.col("term"), F.col("salt"),
                     F.col("block_id"))
        .limit(n_seed_blocks)
        .persist()
    )
    seed_scores = score_blocks(seed).orderBy(F.col("score").desc()).limit(k)
    tau_df = seed_scores.agg(
        F.coalesce(F.min("score"), F.lit(float("-inf"))).alias("tau"),
        F.count("*").alias("m"),
    )

    # per-term global max ub (tiny agg) for union bounds; the
    # cross-term sum is a broadcast 1-row aggregate — executor-side
    per_term_max = meta.groupBy("term").agg(F.max("ub").alias("max_ub"))
    total = per_term_max.agg(F.sum("max_ub").alias("sum_ub"))
    per_term_max = (
        per_term_max.crossJoin(F.broadcast(total))
        .withColumn("ub_others", F.col("sum_ub") - F.col("max_ub"))
        .select("term", "ub_others")
    )
    survivors = (
        meta.join(F.broadcast(per_term_max), "term")
        .crossJoin(F.broadcast(tau_df))
        .filter(
            (F.col("m") < F.lit(k))
            | (F.col("ub") + F.col("ub_others") >= F.col("tau"))
        )
        .drop("tau", "m", "ub_others")
    )
    survivors = survivors.unionByName(
        meta.join(seed.select(*block_key), block_key, "left_semi"),
        allowMissingColumns=True,
    ).dropDuplicates(block_key)

    spark.sparkContext.setLocalProperty("spark.job.description",
                                        "blockmax phase 1")
    result = topk(score_blocks(survivors), k)
    return result
