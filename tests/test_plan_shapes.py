"""Physical-plan shape assertions for the pipeline operators' scale
claims.

COVERAGE.md/docstrings claim specific shapes — "the blocklist
broadcasts", "the corpus never shuffles", "no all-pairs join".  These
tests pin the claims to the actual physical plan so a refactor that
silently degrades a broadcast into a shuffle join (or worse, a
cartesian product) fails CI instead of surfacing as a 100 TB incident.

Plans are inspected BEFORE execution (AdaptiveSparkPlan initial plan):
explicit F.broadcast hints resolve at planning time, which is exactly
what these tests guard.
"""

from pyspark.sql import Row, functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _docs(spark, n=30):
    return spark.createDataFrame(
        [Row(doc_id=i, text=f"tok{i} tok{i + 1} the quick fox {i}")
         for i in range(n)]
    )


def test_blocklist_filter_broadcasts_anti_join(spark):
    from toshi_spark.pipeline.training import blocklist_filter

    pages = spark.createDataFrame(
        [Row(doc_id=0, url="https://a.com/x")])
    blocked = spark.createDataFrame([Row(host="a.com")])
    p = _plan(blocklist_filter(pages, blocked))
    assert "BroadcastHashJoin" in p and "LeftAnti" in p
    assert "CartesianProduct" not in p


def test_contamination_eval_join_broadcasts(spark):
    from toshi_spark.pipeline.training import contamination

    ev = spark.createDataFrame([Row(gram="a b c d e f g h")])
    p = _plan(contamination(_docs(spark), ev))
    # the eval-gram match is hinted broadcast (the per-doc restore
    # join IS a sort-merge on doc_id — correct, both sides doc-scale)
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_dsir_ratio_table_broadcasts(spark):
    from toshi_spark.pipeline.training import dsir_weights

    docs = _docs(spark)
    p = _plan(dsir_weights(docs, docs.limit(5)))
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_apply_thresholds_broadcasts_group_cutoffs(spark):
    from toshi_spark.pipeline.training import (
        apply_thresholds,
        score_thresholds,
    )

    scored = spark.createDataFrame(
        [(i, "en", float(i)) for i in range(10)],
        "doc_id long, lang string, quality double",
    )
    th = score_thresholds(scored, keep_rate=0.5)
    p = _plan(apply_thresholds(scored, th))
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_fuzzy_contamination_band_match_broadcasts(spark):
    from toshi_spark.pipeline.training import fuzzy_contamination

    # inspect the CANDIDATE subplan shape via the full operator's plan
    # string captured pre-collect is impossible (the operator returns
    # an eagerly-materialized frame) — so pin the building blocks:
    # band_buckets explodes map-only and the eval side is hinted.
    from toshi_spark.pipeline.dedup import (
        _signatures_from_tokens,
        band_buckets,
        tokens_col,
    )

    docs = _docs(spark)
    toks = docs.select("doc_id", tokens_col("text").alias("_toks"))
    tb = band_buckets(_signatures_from_tokens(toks, 8, 3), 8, 4)
    eb = tb.withColumnRenamed("doc_id", "eval_id")
    cand = tb.join(F.broadcast(eb), ["band", "bucket"])
    p = _plan(cand)
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    # band explosion is a Generate over the signature projection —
    # no exchange before the join's broadcast side
    assert "Generate explode" in p
    # and the public operator still returns rows (shape smoke)
    out = fuzzy_contamination(docs, docs.limit(3), threshold=0.5)
    assert {r["doc_id"] for r in out.collect()} >= {0, 1, 2}


def test_mix_weights_normalizers_broadcast_not_cartesian(spark):
    from toshi_spark.pipeline.training import mix_weights

    docs = spark.createDataFrame(
        [(i, "en" if i % 2 else "fr") for i in range(10)],
        "doc_id long, lang string",
    )
    p = _plan(mix_weights(docs))
    # 1-row normalizers join via broadcast nested loop, never a
    # shuffled cartesian
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
