"""Staged pipeline artifacts: bit-identity with the live pipeline.

A production dedup/mix run materializes each phase's output (pairs →
clusters → filtered corpus) as parquet and the next phase reads it.
`queries._staged` is the session-scoped form of that contract; these
tests pin that every consumer of a staged artifact returns results
IDENTICAL to running the full pipeline live (the oracle-parity suite
covers the same wiring against DuckDB at sf0.01).
"""

from pyspark.sql import functions as F

from toshi_spark.queries import (
    _CORPUS_CACHE,
    _PAIRS_CACHE,
    _STAGE_CACHE,
    _get_verified_pairs,
    _stage_key,
    analyzed_corpus,
    release_session_artifacts,
    staged_clusters,
)

SF = "/root/testdata/sf0.001"


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def _evict(spark, stage):
    _STAGE_CACHE.pop(_stage_key(stage, SF, spark), None)


def test_staged_clusters_bit_identical_to_live(spark):
    from toshi_spark.pipeline.dedup import dedup_clusters

    _evict(spark, "dedup_clusters")
    live = rows(dedup_clusters(_get_verified_pairs(spark, SF)))
    art = rows(staged_clusters(spark, SF))
    assert art == live
    # second read is a cache hit returning the same materialization
    assert rows(staged_clusters(spark, SF)) == live


def test_survivors_consume_clusters_artifact(spark):
    """Survivor filter over the staged artifact == anti-join over the
    live CC output."""
    from toshi_spark.pipeline.dedup import dedup_clusters
    from toshi_spark.queries import q_dedup_survivors

    docs = analyzed_corpus(spark, SF, augmented=True)
    live_drop = (
        dedup_clusters(_get_verified_pairs(spark, SF))
        .filter(F.col("doc_id") != F.col("cluster_id"))
        .select("doc_id")
    )
    want = rows(
        docs.join(live_drop, "doc_id", "left_anti")
        .select("doc_id").orderBy("doc_id")
    )
    got = rows(q_dedup_survivors(spark, SF))
    assert got == want


def test_mix_stable_across_artifact_cache(spark):
    """assemble_training_mix: first call (builds the atm_selected
    artifact) and second call (reads it) return identical rows."""
    from toshi_spark.queries import q_assemble_training_mix

    _evict(spark, "atm_selected")
    first = rows(q_assemble_training_mix(spark, SF))
    assert _stage_key("atm_selected", SF, spark) in _STAGE_CACHE
    second = rows(q_assemble_training_mix(spark, SF))
    assert first == second
    assert len(first) > 0


def test_release_session_artifacts(spark):
    """The serving-process knob: release drops every artifact for THIS
    context, results are identical after a lazy rebuild."""
    from toshi_spark.queries import q_dedup_survivors

    before = rows(q_dedup_survivors(spark, SF))  # populates artifacts
    sc_id = id(spark.sparkContext)
    assert any(k[1] == sc_id for k in _CORPUS_CACHE)
    n = release_session_artifacts(spark)
    assert n >= 2  # at least corpus + one staged artifact
    for cache, pos in ((_CORPUS_CACHE, 1), (_PAIRS_CACHE, 1),
                       (_STAGE_CACHE, 2)):
        assert not [k for k in cache if k[pos] == sc_id]
    assert rows(q_dedup_survivors(spark, SF)) == before  # rebuilds


def test_mix_selected_artifact_matches_live_filters(spark):
    """The staged filtered corpus == applying the three filter phases
    live (gopher gate ∧ dedup keep ∧ not contaminated)."""
    from toshi_spark.pipeline.dedup import dedup_clusters
    from toshi_spark.pipeline.textstats import gopher_filter
    from toshi_spark.pipeline.training import contamination
    from toshi_spark.queries import (
        _CONTAM_N,
        _eval_ngrams_df,
        q_assemble_training_mix,
    )

    _evict(spark, "atm_selected")
    q_assemble_training_mix(spark, SF).collect()  # populate
    art = _STAGE_CACHE[_stage_key("atm_selected", SF, spark)]

    aug = analyzed_corpus(spark, SF, augmented=True)
    keep_g = gopher_filter(aug, toks_col="toks").filter(
        F.col("keep")
    ).select("doc_id")
    drop_dup = (
        dedup_clusters(_get_verified_pairs(spark, SF))
        .filter(F.col("doc_id") != F.col("cluster_id"))
        .select("doc_id")
    )
    contam = contamination(
        aug, _eval_ngrams_df(analyzed_corpus(spark, SF), toks_col="toks"),
        n=_CONTAM_N, toks_col="toks",
    )
    keep_c = contam.filter(~F.col("contaminated")).select("doc_id")
    live = (
        aug.join(keep_g, "doc_id")
        .join(drop_dup, "doc_id", "left_anti")
        .join(keep_c, "doc_id")
    )
    assert rows(art.select("doc_id")) == rows(live.select("doc_id"))
