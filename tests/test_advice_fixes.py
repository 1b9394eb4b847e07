"""Regression tests for round-2 ADVICE findings: tokenizer-name
validation at create time, rowstore promote-swap crash recovery,
idempotent flush replay, and streaming drain error surfacing."""

import json
import os

import pytest

from toshi_spark.index.catalog import IndexCatalog
from toshi_spark.query.dsl import parse_search
from toshi_spark.schema import QueryError

SCHEMA = [
    {"name": "text", "ftype": "text", "stored": True, "indexed": True},
]


def _mkcat(spark, tmp_path_factory, tag):
    return IndexCatalog(spark, str(tmp_path_factory.mktemp(tag)))


def test_cang_jie_uppercase_accepted(spark, tmp_path_factory):
    # reference schemas spell the CJK tokenizer 'CANG_JIE'
    # (cang_jie::CANG_JIE, toshi-server/src/handlers/index.rs:105)
    cat = _mkcat(spark, tmp_path_factory, "tok_upper")
    cat.create_index("cjk_ix", [
        {"name": "text", "ftype": "text", "stored": True, "indexed": True,
         "tokenizer": "CANG_JIE"},
    ])
    assert cat.schema("cjk_ix").get("text").tokenizer == "cang_jie"
    cat.add_document("cjk_ix", {"text": "春眠不觉晓"}, commit=True)
    ix = cat.open("cjk_ix")
    res = ix.search(parse_search(
        {"query": {"term": {"text": "春眠"}}, "limit": 10}))
    assert res.hits == 1


def test_unknown_tokenizer_rejected_at_create(spark, tmp_path_factory):
    cat = _mkcat(spark, tmp_path_factory, "tok_bad")
    with pytest.raises(QueryError, match="Unknown tokenizer"):
        cat.create_index("bad_ix", [
            {"name": "text", "ftype": "text", "stored": True,
             "indexed": True, "tokenizer": "jieba_deluxe"},
        ])
    assert not cat.exists("bad_ix")  # nothing half-created


def test_flush_replay_does_not_duplicate_rowstore(spark, tmp_path_factory):
    cat = _mkcat(spark, tmp_path_factory, "replay")
    cat.create_index("ix", SCHEMA, merge_policy={"kind": "none"})
    cat.add_document("ix", {"text": "alpha beta"})
    cat.add_document("ix", {"text": "beta gamma"})
    pending = os.path.join(cat._dir("ix"), "pending.jsonl")
    pending_body = open(pending).read()
    meta_before = cat._meta("ix")
    cat.flush("ix")
    # simulate a crash after the segment+rowstore writes but before
    # os.remove(pending)/meta save: same pending docs, same counters
    with open(pending, "w") as f:
        f.write(pending_body)
    cat._save_meta("ix", meta_before)
    cat.flush("ix")  # replay
    ix = cat.open("ix")
    assert ix.corpus.count() == 2  # not 4
    res = ix.search(parse_search(
        {"query": {"term": {"text": "beta"}}, "limit": 10}))
    assert res.hits == 2
    assert [d.doc["text"] for d in res.get_docs()] == [
        "alpha beta", "beta gamma"]


def test_promote_swap_crash_recovery(spark, tmp_path_factory):
    cat = _mkcat(spark, tmp_path_factory, "promote")
    cat.create_index("ix", SCHEMA, merge_policy={"kind": "none"})
    cat.add_document("ix", {"text": "solo value"}, commit=True)
    rowstore = cat._rowstore_path("ix")
    # simulate the crash window: a COMPLETE .promote exists, the old
    # rowstore was renamed aside, the new one never moved in
    df = cat._read_rowstore("ix")
    df.write.mode("overwrite").parquet(rowstore + ".promote")
    os.replace(rowstore, rowstore + ".old")
    assert not os.path.exists(rowstore)
    ix = cat.open("ix")  # must recover, not crash
    assert os.path.exists(rowstore)
    assert not os.path.exists(rowstore + ".promote")
    assert not os.path.exists(rowstore + ".old")
    assert ix.corpus.count() == 1
    # stale leftovers next to an intact rowstore are discarded
    spark.createDataFrame([(1,)], "x int").write.mode("overwrite").parquet(
        rowstore + ".promote"
    )
    cat.open("ix")
    assert not os.path.exists(rowstore + ".promote")


def test_streaming_drain_raises_on_failure(spark, tmp_path):
    from toshi_spark.streaming.windows import stream_windowed_counts

    src = tmp_path / "src"
    src.mkdir()
    (src / "a.json").write_text(json.dumps(
        {"ts": "2026-01-01T00:00:00", "user_id": 1}) + "\n")
    # unwritable sink: the output path is a regular FILE
    out = tmp_path / "out"
    out.write_text("not a directory")
    with pytest.raises(Exception):
        stream_windowed_counts(
            spark, str(src), "ts string, user_id long", str(out),
            str(tmp_path / "ckpt"),
        )


def test_embedding_neardup_recall_on_perturbed_pairs(spark):
    """VERDICT r2: single-band 8-plane LSH missed ~80% of true 0.95-cos
    pairs and the old oracle's sign-preserving scalings couldn't catch
    it.  Banded blocking must recover noise-perturbed planted dups."""
    from toshi_spark.queries import q_embedding_neardup

    out = q_embedding_neardup(spark, "/root/testdata/sf0.001")
    pairs = {(r["a"], r["b"]) for r in out.collect()}
    planted = {(i, i + 100000) for i in range(5)}
    recall = len(planted & pairs) / len(planted)
    assert recall >= 0.9, (recall, sorted(pairs))
