"""End-to-end slice: fixture corpus → index tables → term-query BM25 top-k.

Hand-computed contract on the reference 5-doc fixture
(toshi-server/src/commit.rs:56-60): every test_text doc has 3 tokens,
so avgdl=3, N=5; term 'document' has df=3, tf=1 in docs {0,3,4}:
  idf      = ln(1 + (5-3+0.5)/(3+0.5)) = ln(1 + 2.5/3.5)
  tf_norm  = 1*(k1+1) / (1 + k1*(1-b + b*3/3)) = 2.2/2.2 = 1.0
  score    = idf ≈ 0.5389965
"""

import math

import pytest
from pyspark.sql import functions as F

from toshi_spark.fixtures import toshi_fixture_docs
from toshi_spark.index.builder import build_index
from toshi_spark.scoring import bm25_score, topk


@pytest.fixture(scope="module")
def fixture_index(spark):
    docs = toshi_fixture_docs(spark)
    return build_index(docs, id_col="doc_id", text_fields="test_text")


def test_index_stats(fixture_index):
    assert fixture_index.n_docs == 5
    assert fixture_index.avgdl == 3.0


def test_postings_shape(fixture_index):
    rows = fixture_index.postings.filter(F.col("term") == "document").collect()
    assert sorted(r.doc_id for r in rows) == [0, 3, 4]
    assert all(r.tf == 1 for r in rows)
    assert all(list(r.positions) == [1] for r in rows)


def test_termstats_df(fixture_index):
    stats = {r.term: r.df for r in fixture_index.termstats.collect()}
    assert stats["test"] == 5
    assert stats["document"] == 3
    assert stats["dockument"] == 1
    assert stats["duckiment"] == 1


def test_term_query_bm25(fixture_index):
    ix = fixture_index
    matched = ix.postings.filter(
        (F.col("field") == "test_text") & (F.col("term") == "document")
    )
    scored = bm25_score(matched, ix.doclens, ix.termstats, ix.n_docs, ix.avgdl)
    got = topk(scored, 100).collect()
    assert [r.doc_id for r in got] == [0, 3, 4]  # tie → doc_id asc
    expected = math.log(1.0 + 2.5 / 3.5)
    for r in got:
        assert abs(r.score - expected) < 1e-12


def test_doc_ids_dense_and_unique(spark):
    """assign_doc_ids must yield EXACTLY 0..N-1 (the two-pass ranged
    scheme materializes its layout once — regression for the 500k run
    where boundary drift between the count and rank jobs produced
    duplicate ids: 486,433 distinct for 500,000 rows)."""
    from toshi_spark.fixtures import synth_webtext
    from toshi_spark.index.docmap import assign_doc_ids

    n = 60_000
    corpus = assign_doc_ids(
        synth_webtext(spark, n, seed=7, partitions=16), order_col="url",
        num_partitions=16,
    )
    ids = corpus.select("doc_id")
    assert ids.distinct().count() == n
    row = ids.agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"),
                  F.count("*").alias("c")).collect()[0]
    assert (row["lo"], row["hi"], row["c"]) == (0, n - 1, n)
    # deterministic across evaluations
    again = assign_doc_ids(
        synth_webtext(spark, n, seed=7, partitions=16), order_col="url",
        num_partitions=16,
    )
    j = corpus.alias("a").join(again.alias("b"), F.col("a.url") == F.col("b.url"))
    assert j.filter(F.col("a.doc_id") != F.col("b.doc_id")).count() == 0
