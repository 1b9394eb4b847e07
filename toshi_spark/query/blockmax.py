"""Metadata-pruned block-max top-k over the compressed block table.

Spark rendition of Tantivy 0.19's BlockWAND (engaged by the plain
``TopDocs`` collector the reference uses, ``handle.rs:94`` — SURVEY.md
§4 pins this as an explicit requirement).  Sequential WAND does not
map to a distributed engine; the distributed equivalent is a
metadata-pruned scan.  Since block format v4 the pruning threshold τ
comes from block METADATA alone (no seed decode), so the plan is:

  job 1    per-term bound aggregation over the metadata columns of the
           query terms' blocks — a column-pruned, term-filter-pushed
           scan (payload bytes are never read), window cumsum, ≤ one
           output row per query term, collected to the driver.  This
           is a METADATA-scale collect, like fieldstats: at 10^12 docs
           it reduces ~df/128 skip entries per term to len(terms) rows.
  job 2    survivor filter with the bounds inlined as LITERALS (no
           broadcast subplans, no extra exchanges), Arrow-decode the
           surviving payloads, exact BM25 against the broadcast query-
           term stats (doc_len rides inline in the payload — zero
           doclens join), distributed top-k.

Bound construction:

  each block stores its EXACT impact stats at the segment's build
  avgdl: max_tfn (BlockWAND's per-block max score sans idf) and hi_tfn
  (the HI_RANK-th largest tf_norm — the block certifies
  min(count, HI_RANK) postings ≥ hi_tfn; a doc_id-ordered block's MIN
  is near the corpus floor and would prune nothing).  When query-time
  avgdl differs (stitched multi-segment mean), the per-posting ratio
  tfn_q/tfn_ref = (tf+A+C_r·dl)/(tf+A+C_q·dl) is monotone in tf and
  dl, so its extremes lie at the corners of
  [min_tf,max_tf]×[min_dl,max_dl]:

      ub(block) = idf · max_tfn · max(corner ratios)
      hi(block) = idf · hi_tfn  · min(corner ratios)

  τ_t = the crossing block's hi when Σ min(count, HI_RANK) in hi-desc
  order first reaches k — sound because a term's postings are distinct
  docs (salts split by doc_id, segments are disjoint) and total score
  only adds over terms.  τ = max_t τ_t.  A block survives iff

      ub(block) + Σ_{t'≠t} max_ub(t') ≥ τ.

Soundness: a doc only in pruned blocks has, for each query term t it
matches, block ub below the survivor line, so its total score
< τ ≤ kth exact score — it cannot enter the top-k.  Ties survive
because the filter is ``>=``.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from .. import B, K1
from ..index.blocks import HI_RANK, decode_blocks_df
from ..scoring import idf_col, tf_norm_dyn, topk

# max candidate-block metadata rows collected driver-side by job 1;
# past this the distributed window plan takes over (10^9+ doc terms).
# Enforced exactly via limit(), not estimated — see _block_bounds.
COLLECT_BOUND = 1_000_000


def _avgdl_for(fieldstats: DataFrame | float, field: str) -> float:
    """Query-time avgdl as a scalar (fieldstats is literal metadata —
    built indexes materialize it as a local relation, segment opens
    stitch it from stats.json).  Collected UNFILTERED: a bare collect
    on a local relation is a driver-side LocalTableScan (no job); a
    filter on top would fall back to a full task launch."""
    if isinstance(fieldstats, (int, float)):
        return float(fieldstats)
    seen = []
    for r in fieldstats.collect():
        if r["field"] == field:
            return float(r["avgdl"])
        seen.append(r["field"])
    # a 0.0 default would divide doc lengths by zero downstream and
    # return k arbitrary docs all scored 0.0 — fail loudly instead
    raise KeyError(
        f"field {field!r} has no avgdl in fieldstats (known: {seen}); "
        "was it indexed as a text field?"
    )


def _block_bounds(
    blocks: DataFrame,
    termstats: DataFrame,
    n_docs: int,
    field: str,
    terms: list[str],
    k: int,
    avgdl: float,
    tf_mode: str = "full",
):
    """Shared metadata pass: candidate block metadata with (ub, hi,
    hi_n) columns, the pruning threshold tau, per-term rest-of-query
    upper bounds and dfs.  Used by blockmax_topk (job 1) and by
    blockmax_prune_stats (observability)."""
    cand = blocks.filter(
        (F.col("field") == field) & F.col("term").isin(list(terms))
    )
    # query-term dictionary slice: tiny (≤ len(terms) rows), broadcast
    # everywhere — the scoring join after the opaque Arrow decode gets
    # no inferred constraints, so pre-filtering is what keeps the full
    # dictionary out of the plan
    ts_q = termstats.filter(
        (F.col("field") == field) & F.col("term").isin(list(terms))
    ).select("field", "term", "df")
    meta = cand.join(F.broadcast(ts_q), ["field", "term"])
    idf = idf_col(n_docs, F.col("df").cast("double"))

    a_const = F.lit(K1 * (1.0 - B))
    c_ref = F.lit(K1 * B) / F.col("ref_avgdl")
    c_q = F.lit(K1 * B / max(avgdl, 1e-300))

    def ratio(tf: Column, dl: Column) -> Column:
        return (tf + a_const + c_ref * dl) / (tf + a_const + c_q * dl)

    corners = [
        ratio(F.col(tf).cast("double"), F.col(dl).cast("double"))
        for tf in ("min_tf", "max_tf")
        for dl in ("min_dl", "max_dl")
    ]
    if tf_mode == "basic":
        # tf pinned to 1: impact stats (built on real tf) don't apply;
        # bound the tf=1 norm directly from the dl corner stats
        def tfn1(dl: Column) -> Column:
            return F.lit(K1 + 1.0) / (F.lit(1.0) + a_const + c_q * dl)

        ub = idf * tfn1(F.col("min_dl").cast("double"))
        # EVERY posting scores ≥ the tf=1 norm at max_dl, so the block
        # certifies its full count at hi
        hi = idf * tfn1(F.col("max_dl").cast("double"))
        hi_n = F.col("count").cast("long")
    else:
        ub = idf * F.col("max_tfn") * F.greatest(*corners)
        hi = idf * F.col("hi_tfn") * F.least(*corners)
        hi_n = F.least(F.col("count"), F.lit(HI_RANK)).cast("long")
    meta = (
        meta.withColumn("ub", ub)
        .withColumn("hi", hi)
        .withColumn("hi_n", hi_n)
    )

    # job 1: per-term (τ_t, max_ub) off metadata columns only.  When the
    # candidate metadata is collectable, a plain scan+collect (no
    # exchanges) beats the window plan's two shuffles; past the bound
    # (10^9+ doc terms) the distributed window is the scale shape.
    # The bound is enforced EXACTLY via limit(bound+1) — an a-priori
    # estimate under-counts partial blocks (each (term, salt, segment)
    # run ends in one): with 16 salts × many flush/merge segments the
    # real row count can exceed len(terms)·(n_docs/128 + c) and
    # pressure driver memory.  limit() collects incrementally, so the
    # overflow probe costs at most one extra partition scan before
    # falling back to the distributed plan.
    dfs: dict[str, int] = {}
    rows = (
        meta.select("term", "df", "hi", "hi_n", "ub")
        .limit(COLLECT_BOUND + 1)
        .collect()
    )
    if len(rows) <= COLLECT_BOUND:
        by_term: dict[str, list] = {}
        for r in rows:
            by_term.setdefault(r["term"], []).append(r)
            dfs[r["term"]] = int(r["df"])
        taus, max_ubs = [], {}
        for t, rs in by_term.items():
            rs.sort(key=lambda r: -r["hi"])
            max_ubs[t] = max(r["ub"] for r in rs)
            cum = 0
            for r in rs:
                cum += r["hi_n"]
                if cum >= k:
                    taus.append(r["hi"])
                    break
        sum_ub = sum(max_ubs.values())
        tau = max(taus) if taus else float("-inf")
        ub_others = {t: sum_ub - v for t, v in max_ubs.items()}
    else:
        w = Window.partitionBy("term").orderBy(
            F.col("hi").desc()
        ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        per_term = (
            meta.select("term", "df", "hi", "hi_n", "ub")
            .withColumn("cum", F.sum("hi_n").over(w))
            .groupBy("term")
            .agg(
                F.max(
                    F.when(F.col("cum") >= F.lit(k), F.col("hi"))
                ).alias("tau_t"),
                F.max("ub").alias("max_ub"),
                F.max("df").alias("df"),
            )
            .collect()
        )
        taus = [r["tau_t"] for r in per_term if r["tau_t"] is not None]
        tau = max(taus) if taus else float("-inf")
        sum_ub = sum(r["max_ub"] for r in per_term)
        ub_others = {r["term"]: sum_ub - r["max_ub"] for r in per_term}
        dfs = {r["term"]: int(r["df"]) for r in per_term}

    return meta, tau, ub_others, dfs


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
    """Top-k BM25 over a union-of-terms query using block-max pruning.

    ``doclens`` is accepted for API compatibility but unused: block
    payloads carry doc_len inline (format v4), so scoring the decoded
    survivors needs no doclens join.
    """
    avgdl = _avgdl_for(fieldstats, field)
    meta, tau, ub_others, dfs = _block_bounds(
        blocks, termstats, n_docs, field, terms, k, avgdl, tf_mode
    )
    # job 2: literal-bound survivor filter → decode → exact BM25 → top-k.
    # df came back with job 1, so idf inlines as ≤ len(terms) literals:
    # the scoring pass is decode → column arithmetic → one groupBy(doc)
    # — no dictionary join at all.
    others_map = F.create_map(
        *[x for t, v in ub_others.items() for x in (F.lit(t), F.lit(v))]
    )
    survivors = meta.filter(
        F.col("ub") + F.coalesce(others_map[F.col("term")], F.lit(0.0))
        >= F.lit(tau)
    )
    decoded = decode_blocks_df(
        survivors.select("field", "term", "first_doc", "doc_deltas",
                         "tfs", "dls")
    )
    idf_map = F.create_map(
        *[
            x
            for t, df_t in dfs.items()
            for x in (
                F.lit(t),
                F.lit(
                    math.log(
                        1.0 + (n_docs - df_t + 0.5) / (df_t + 0.5)
                    )
                ),
            )
        ]
    )
    tf = F.lit(1.0) if tf_mode == "basic" else F.col("tf").cast("double")
    scored = (
        decoded.withColumn(
            "part_score",
            idf_map[F.col("term")]
            * tf_norm_dyn(tf, F.col("doc_len").cast("double"),
                          F.lit(avgdl)),
        )
        .groupBy("doc_id")
        .agg(F.sum("part_score").alias("score"))
    )
    return topk(scored, k)


def blockmax_prune_stats(
    blocks: DataFrame,
    termstats: DataFrame,
    fieldstats: DataFrame | float,
    n_docs: int,
    field: str,
    terms: list[str],
    k: int,
    tf_mode: str = "full",
) -> dict:
    """Observability: per-term pruning effectiveness for a query.

    Returns {"tau": τ, "terms": {t: {"blocks", "survivors", "postings",
    "surviving_postings"}}} using the exact bounds blockmax_topk plans
    with.  Pruning power is CORPUS-SHAPED, not just an implementation
    property: on flat synthetic corpora (tf≈1 everywhere, uniform doc
    lengths) block impact bounds are nearly uniform and τ — set by the
    rarest term's k-th certified score — sits below every block's
    rest-of-query upper bound, so unions of disparate-df terms decode
    ~everything (measured: 0% pruned on the 53M-posting synthetic
    index for a stopword+mid+rare union).  On real webtext the tf and
    doc-length skew concentrates impact in few blocks and the same
    bounds prune.  This helper is how an operator measures that on
    THEIR corpus before trusting the pruned path's cost model.
    """
    avgdl = _avgdl_for(fieldstats, field)
    meta, tau, ub_others, _ = _block_bounds(
        blocks, termstats, n_docs, field, terms, k, avgdl, tf_mode
    )
    others_map = F.create_map(
        *[x for t, v in ub_others.items() for x in (F.lit(t), F.lit(v))]
    )
    agg = (
        meta.withColumn(
            "survives",
            (
                F.col("ub")
                + F.coalesce(others_map[F.col("term")], F.lit(0.0))
                >= F.lit(tau)
            ).cast("int"),
        )
        .groupBy("term")
        .agg(
            F.count("*").alias("blocks"),
            F.sum("survives").alias("survivors"),
            F.sum("count").alias("postings"),
            F.sum(F.col("count") * F.col("survives")).alias(
                "surviving_postings"
            ),
        )
        .collect()
    )
    return {
        "tau": tau,
        "terms": {
            r["term"]: {
                "blocks": int(r["blocks"]),
                "survivors": int(r["survivors"]),
                "postings": int(r["postings"]),
                "surviving_postings": int(r["surviving_postings"]),
            }
            for r in agg
        },
    }
