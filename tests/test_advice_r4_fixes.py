"""Regression tests for round-3 ADVICE findings: fuzzy-distance
parsing, ragged-embedding guards, blockmax collect bound, reliable
checkpointing, and stale-segment migration."""

import json
import os

import pytest
from pyspark.sql import functions as F

from toshi_spark.api import ToshiApi
from toshi_spark.index.catalog import IndexCatalog
from toshi_spark.query.dsl import parse_search
from toshi_spark.schema import QueryError

SCHEMA = [
    {"name": "text", "ftype": "text", "stored": True, "indexed": True},
]


# ---------------------------------------------------------------- raw fuzzy


def test_raw_fuzzy_distance_over_two_rejected(spark):
    """`spark~10` used to misparse as distance 1 + bare term '0'."""
    from toshi_spark.query.raw import parse_raw
    from toshi_spark.schema import FieldSpec, IndexSchema

    schema = IndexSchema([FieldSpec("text", "text")])
    with pytest.raises(QueryError, match="Fuzzy distance 10"):
        parse_raw("text:spark~10", schema)
    with pytest.raises(QueryError, match="Fuzzy distance 3"):
        parse_raw("spark~3", schema)
    # 0..2 still parse
    for d in (0, 1, 2):
        q = parse_raw(f"text:spark~{d}", schema)
        assert q.__class__.__name__ == "FuzzyQuery"
        assert q.distance == d


# ------------------------------------------------------- embedding guards


def _emb_df(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )


def test_rh_signatures_null_vector_raises(spark):
    from toshi_spark.pipeline.similarity import rh_signatures

    emb = _emb_df(spark, [(1, [0.1, 0.2]), (2, None)])
    with pytest.raises(Exception, match="null vector"):
        rh_signatures(emb, n_planes=8).collect()


def test_rh_signatures_ragged_raises_even_when_divisible(spark):
    """2 rows × (3 + 1) values = 4 divides 2 — the old divisibility
    check reshaped this silently into wrong buckets."""
    from toshi_spark.pipeline.similarity import rh_signatures

    emb = _emb_df(spark, [(1, [0.1, 0.2, 0.3]), (2, [0.4])]).coalesce(1)
    with pytest.raises(Exception, match="ragged embedding"):
        rh_signatures(emb, n_planes=8).collect()


def test_rh_signatures_uniform_ok(spark):
    from toshi_spark.pipeline.similarity import rh_signatures

    emb = _emb_df(spark, [(i, [float(i), -1.0, 0.5]) for i in range(10)])
    out = rh_signatures(emb, n_planes=8).collect()
    assert len(out) == 10
    assert all(0 <= r["bucket"] < 256 for r in out)


# ----------------------------------------------- blockmax window fallback


def test_blockmax_window_path_rank_identity(spark, monkeypatch):
    """Force the distributed-window job-1 path (COLLECT_BOUND=0) and
    check it plans the same τ/bounds → same top-k as the collect path."""
    from toshi_spark.fixtures import synth_webtext
    from toshi_spark.index.blocks import encode_blocks_df
    from toshi_spark.index.builder import build_index, salted_postings
    from toshi_spark.index.docmap import assign_doc_ids
    from toshi_spark.query import blockmax

    corpus = assign_doc_ids(synth_webtext(spark, 200, seed=7),
                            order_col="url")
    ix = build_index(corpus, id_col="doc_id", text_fields="text")
    salted = salted_postings(ix.postings, ix.termstats,
                             df_threshold=100, n_salts=4)
    avgdl = {r["field"]: float(r["avgdl"])
             for r in ix.fieldstats.collect()}
    blocks = encode_blocks_df(salted, avgdl).persist()
    args = (blocks, ix.termstats, ix.doclens, ix.fieldstats, ix.n_docs,
            "text", ["w0", "w1", "w50"], 10)
    want = [(r.doc_id, round(r.score, 10))
            for r in blockmax.blockmax_topk(*args).collect()]
    monkeypatch.setattr(blockmax, "COLLECT_BOUND", 0)
    got = [(r.doc_id, round(r.score, 10))
           for r in blockmax.blockmax_topk(*args).collect()]
    blocks.unpersist()
    assert got == want


# ------------------------------------------------- reliable checkpointing


def test_cut_lineage_uses_checkpoint_dir_when_set(spark, tmp_path):
    from toshi_spark.pipeline.dedup import _cut_lineage, dedup_clusters

    ckpt = str(tmp_path / "ckpt")
    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None
    sc.setCheckpointDir(ckpt)
    try:
        df = spark.range(5).withColumn("x", F.col("id") * 2)
        out = _cut_lineage(df)
        assert sorted(r["x"] for r in out.collect()) == [0, 2, 4, 6, 8]
        # reliable checkpoint materialized files under the dir
        found = any(files for _, _, files in os.walk(ckpt))
        assert found, "no checkpoint files written under checkpoint dir"
        # the CC loop still converges on the reliable path
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11)], "a long, b long"
        )
        labels = {r["doc_id"]: r["cluster_id"]
                  for r in dedup_clusters(pairs).collect()}
        assert labels == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
    finally:
        # pyspark has no unset API; point it at a scratch dir so other
        # tests in the session keep localCheckpoint semantics untouched
        none_opt = getattr(getattr(sc._jvm.scala, "None$"), "MODULE$")
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(none_opt)
        assert sc.getCheckpointDir() is None


# -------------------------------------------------- stale-segment migration


def test_migrate_stale_segments_upgrades_flush_segment(
    spark, tmp_path_factory
):
    import json

    from toshi_spark.index.segments import (
        Manifest,
        SEGMENT_FORMAT_VERSION,
        migrate_stale_segments,
        open_segmented_tables,
    )

    cat = IndexCatalog(spark, str(tmp_path_factory.mktemp("migrate")))
    cat.create_index("ix", SCHEMA, merge_policy={"kind": "none"})
    cat.add_document("ix", {"text": "alpha beta gamma"})
    cat.add_document("ix", {"text": "beta gamma delta"})
    cat.flush("ix")
    ix = cat.open("ix")

    def hits(index):
        res = index.search(parse_search(
            {"query": {"term": {"text": "beta"}}, "limit": 10}
        ))
        return sorted(
            (d.doc["text"], round(d.score, 8)) for d in res.docs
        )

    want = hits(ix)
    assert len(want) == 2

    # simulate an index written under an older format: rewrite the
    # manifest entry's format_version (the raw tables stay compatible)
    index_dir = cat._dir("ix")
    manifest_path = os.path.join(index_dir, "manifest.jsonl")
    entries = [json.loads(l) for l in open(manifest_path) if l.strip()]
    assert len(entries) == 1
    old_id = entries[0]["segment_id"]
    entries[0]["format_version"] = SEGMENT_FORMAT_VERSION - 1
    with open(manifest_path, "w") as f:
        for e in entries:
            f.write(json.dumps(e) + "\n")

    with pytest.raises(ValueError, match="older-format|format version"):
        open_segmented_tables(spark, index_dir)

    new_ids = migrate_stale_segments(spark, index_dir, index_name="ix")
    assert len(new_ids) == 1 and new_ids[0] != old_id
    after = Manifest(index_dir).entries()
    assert [e.segment_id for e in after] == new_ids
    assert after[0].format_version == SEGMENT_FORMAT_VERSION
    assert after[0].docs == 2
    # old payload dir is gone, new one exists
    segs = os.listdir(os.path.join(index_dir, "segments"))
    assert old_id not in segs and new_ids[0] in segs

    assert hits(cat.open("ix")) == want

    # idempotent: nothing stale left
    assert migrate_stale_segments(spark, index_dir, index_name="ix") == []


# ------------------------------------------------ analyzer versioning


def test_stale_analyzer_version_refused_on_open(spark, tmp_path_factory):
    """en_stem terms are derived data: an index stemmed under the old
    Porter-1980 chain must fail loudly at open() (queries analyze with
    the current Snowball chain and would silently return zero hits)."""
    import json as _json

    cat = IndexCatalog(spark, str(tmp_path_factory.mktemp("anver")))
    cat.create_index("st", [
        {"name": "body", "ftype": "text", "stored": True, "indexed": True,
         "tokenizer": "en_stem"},
    ], merge_policy={"kind": "none"})
    cat.add_document("st", {"body": "running fairly"}, commit=True)
    assert cat.open("st") is not None  # current version opens fine

    # simulate a pre-round-4 index: drop the recorded analyzer version
    meta_path = os.path.join(cat._dir("st"), "index.json")
    meta = _json.load(open(meta_path))
    del meta["analyzer_versions"]
    _json.dump(meta, open(meta_path, "w"))
    # QueryError so the API layer surfaces it as a 400, not a crash
    with pytest.raises(QueryError, match="analyzer version"):
        cat.open("st")

    # default-tokenizer indexes are unaffected (its version is still 1)
    cat.create_index("plain", SCHEMA, merge_policy={"kind": "none"})
    cat.add_document("plain", {"text": "hello"}, commit=True)
    meta_path = os.path.join(cat._dir("plain"), "index.json")
    meta = _json.load(open(meta_path))
    del meta["analyzer_versions"]
    _json.dump(meta, open(meta_path, "w"))
    assert cat.open("plain") is not None


def test_bulk_threshold_counts_bytes_not_chars(spark, tmp_path_factory):
    """A non-ASCII body must trigger the distributed path by BYTE size."""
    cat = IndexCatalog(spark, str(tmp_path_factory.mktemp("bytes")))
    a = ToshiApi(cat, bulk_distributed_bytes=200_000)
    code, _ = a.handle("PUT", "/b/_create", SCHEMA)
    assert code == 201
    # ~300 chars/doc but ~900 bytes/doc (3-byte CJK chars)
    body = "\n".join(
        json.dumps({"text": "北京" * 100 + f" doc{i}"},
                   ensure_ascii=False)
        for i in range(400)
    )
    assert len(body) < 200_000 < len(body.encode("utf-8"))
    code, resp = a.handle("POST", "/b/_bulk", body)
    assert code == 201 and resp["docs"] == 400
