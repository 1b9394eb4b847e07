"""Unicode analyzer end-to-end: index build over a mixed-script corpus.

The kernel-vs-scalar identity is unit-pinned in test_analyzer_fast.py;
these tests pin the whole SPARK path (mapInArrow kernel on executors →
postings/doclens/termstats) on a corpus with Cyrillic, CJK, Latin-1,
Greek, combining marks, and over-40-byte non-ASCII tokens — the shapes
a multilingual crawl actually has.
"""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from toshi_spark.analyzer import analyze_doc
from toshi_spark.fixtures import synth_webtext_multiscript
from toshi_spark.index.builder import build_index
from toshi_spark.index.docmap import assign_doc_ids
from toshi_spark.scoring import bm25_score, topk

N_DOCS = 400


@pytest.fixture(scope="module")
def corpus(spark):
    return assign_doc_ids(
        synth_webtext_multiscript(spark, N_DOCS, seed=11),
        order_col="url",
    ).select("doc_id", "text").persist()


@pytest.fixture(scope="module")
def ix(corpus):
    return build_index(corpus, id_col="doc_id", text_fields="text")


def test_postings_match_scalar_analyzer(spark, corpus, ix):
    """Every (doc, term, tf, positions, doc_len) row from the Spark
    kernel path equals the driver-side scalar chain."""
    texts = {r.doc_id: r.text for r in corpus.collect()}
    got = {
        (r.doc_id, r.term): (r.tf, tuple(r.positions))
        for r in ix.postings.collect()
    }
    doclens = {r.doc_id: r.doc_len for r in ix.doclens.collect()}
    exp_rows = 0
    for doc_id, text in texts.items():
        agg, n = analyze_doc(text)
        assert doclens[doc_id] == n, f"doc_len mismatch doc {doc_id}"
        for term, plist in agg.items():
            assert got[(doc_id, term)] == (len(plist), tuple(plist)), (
                doc_id, term
            )
            exp_rows += 1
    # no extra posting rows beyond the scalar expectation
    n_postings = sum(1 for k in got if k[1] != "")
    assert n_postings == exp_rows


def test_long_nonascii_token_dropped(ix):
    # "ё"*25 is 50 UTF-8 bytes — RemoveLongFilter drops it on byte
    # length, not char count (25 chars would survive a char-count bug)
    assert ix.postings.filter(F.col("term") == "ё" * 25).count() == 0


def test_cyrillic_marker_terms_unique(ix, corpus):
    # one posting row per doc for its unique Cyrillic marker term
    n = ix.postings.filter(F.col("term").startswith("маркер")).count()
    assert n == N_DOCS


def test_bm25_over_cyrillic_term(spark, corpus, ix):
    """BM25 ranking over a Cyrillic head term matches a driver-side
    reference computed from the scalar analyzer."""
    import math

    texts = {r.doc_id: r.text for r in corpus.collect()}
    term = "привет"
    tf, dls = {}, {}
    for doc_id, text in texts.items():
        agg, n = analyze_doc(text)
        dls[doc_id] = n
        if term in agg:
            tf[doc_id] = len(agg[term])
    n_docs = len(texts)
    avgdl = sum(dls.values()) / n_docs
    df = len(tf)
    idf = math.log(1 + (n_docs - df + 0.5) / (df + 0.5))
    exp = {
        d: round(idf * (t * 2.2) / (t + 1.2 * (0.25 + 0.75 * dls[d] / avgdl)), 4)
        for d, t in tf.items()
    }
    matched = ix.postings.filter(
        (F.col("field") == "text") & (F.col("term") == term)
    )
    scored = bm25_score(
        matched, ix.doclens, ix.termstats, ix.n_docs, ix.fieldstats,
        tf_mode="full", unique_doc_terms=True,
    )
    got = {
        r.doc_id: round(r.score, 4)
        for r in topk(scored, len(exp)).collect()
    }
    assert len(got) == len(exp)
    for d, s in got.items():
        assert abs(s - exp[d]) <= 1e-3, (d, s, exp[d])


def test_fixture_deterministic_across_parallelism(spark):
    a = Counter(
        r.text for r in synth_webtext_multiscript(
            spark, 60, seed=3, partitions=1
        ).collect()
    )
    b = Counter(
        r.text for r in synth_webtext_multiscript(
            spark, 60, seed=3, partitions=7
        ).collect()
    )
    assert a == b
