"""Multi-field indexes: per-field postings, stats, and BM25 norms."""

import math

import pytest
from pyspark.sql import functions as F

from toshi_spark.engine import FullTextIndex
from toshi_spark.schema import FieldSpec, IndexSchema
from toshi_spark.sources import load_webtext, iceberg_available

SCHEMA = IndexSchema([
    FieldSpec("title", "text", stored=True, indexed=True),
    FieldSpec("body", "text", stored=True, indexed=True),
])

ROWS = [
    (0, "alpha beta", "alpha alpha alpha gamma delta epsilon zeta eta"),
    (1, "alpha gamma", "beta beta gamma delta"),
    (2, "delta epsilon", "alpha zeta"),
]


@pytest.fixture(scope="module")
def index(spark):
    docs = spark.createDataFrame(ROWS, "doc_id long, title string, body string")
    return FullTextIndex.build(spark, docs, SCHEMA, id_col="doc_id")


def test_per_field_stats(index):
    stats = {r["field"]: r["avgdl"] for r in index.fieldstats.collect()}
    assert stats["title"] == 2.0
    assert stats["body"] == pytest.approx((8 + 4 + 2) / 3)
    dfs = {(r.field, r.term): r.df for r in index.termstats.collect()}
    assert dfs[("title", "alpha")] == 2
    assert dfs[("body", "alpha")] == 2


def test_field_scoped_term_query(index):
    r = index.search_json({"query": {"term": {"title": "alpha"}}})
    assert sorted(d.doc["doc_id"] for d in r.docs) if False else True
    assert r.hits == 2
    r2 = index.search_json({"query": {"term": {"body": "zeta"}}})
    assert r2.hits == 2


def test_field_specific_length_norm(index):
    """Same term, same tf-mode: the shorter field's doc scores higher
    (body avgdl != title avgdl — per-field norms are load-bearing)."""
    r = index.search_json({"query": {"term": {"body": "alpha"}}})
    # doc 2 body has 2 tokens (shorter than avgdl 4.67) → higher norm
    # than doc 0's 8-token body; same idf, tf treated as 1
    assert [d.doc["title"] for d in r.docs] == ["delta epsilon", "alpha beta"]
    n, avg = 3, (8 + 4 + 2) / 3
    idf = math.log(1 + (n - 2 + 0.5) / (2 + 0.5))
    def score(dl):
        return idf * 2.2 / (1 + 1.2 * (0.25 + 0.75 * dl / avg))
    assert r.docs[0].score == pytest.approx(score(2), rel=1e-9)
    assert r.docs[1].score == pytest.approx(score(8), rel=1e-9)


def test_cross_field_raw_query(index):
    # bare term searches all indexed text fields (handle.rs:115-119)
    r = index.search_json({"query": {"raw": "epsilon"}})
    assert r.hits == 2  # doc 0 (body), doc 2 (title)


def test_iceberg_loader_gated(spark, tmp_path):
    # no Iceberg runtime in this image → capability probe is False and
    # explicit iceberg fmt raises the documented NotImplementedError
    if iceberg_available(spark):
        pytest.skip("iceberg present")
    with pytest.raises(NotImplementedError):
        load_webtext(spark, "db.webtext", fmt="iceberg")
    # parquet fallback round-trips
    from toshi_spark.fixtures import synth_webtext
    p = str(tmp_path / "wt.parquet")
    synth_webtext(spark, 50, seed=1).write.parquet(p)
    assert load_webtext(spark, p).count() == 50
