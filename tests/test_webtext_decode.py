"""Round-3 additions: HTML→text extraction + native BMP decode."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from toshi_spark.pipeline.multimodal import (
    attach_bmp,
    decode_bmp,
    decode_image,
    decode_images,
    encode_bmp,
)
from toshi_spark.pipeline.webtext import extract_text


# --- BMP codec (pure numpy, no Spark) -----------------------------------

@pytest.mark.parametrize("w,h", [(1, 1), (4, 2), (5, 3), (6, 4), (7, 5)])
def test_bmp_roundtrip(w, h):
    # widths 5 and 7 force non-trivial row padding (stride % 4)
    rng = np.random.default_rng(w * 100 + h)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    data = encode_bmp(px)
    assert data[:2] == b"BM"
    out = decode_bmp(data)
    assert out.shape == (h, w, 3)
    np.testing.assert_array_equal(out, px)


def test_bmp_decode_layout_details():
    # pixel values chosen so row order and channel order are distinct
    px = np.array(
        [[[1, 2, 3], [4, 5, 6]],
         [[7, 8, 9], [10, 11, 12]]], dtype=np.uint8
    )
    data = encode_bmp(px)
    # header: 24 bpp, uncompressed, positive (bottom-up) height
    assert data[28] == 24
    assert int.from_bytes(data[30:34], "little") == 0
    # first stored row is the BOTTOM image row, channels BGR
    offset = int.from_bytes(data[10:14], "little")
    assert list(data[offset:offset + 3]) == [9, 8, 7]
    out = decode_bmp(data)
    np.testing.assert_array_equal(out, px)


def test_decode_image_dispatches_bmp():
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    out = decode_image(encode_bmp(px))
    np.testing.assert_array_equal(out, px)


def test_decode_rejects_non_bmp_without_codec():
    with pytest.raises((NotImplementedError, ValueError)):
        decode_image(b"\x89PNG\r\n\x1a\nnot-a-real-png")


# --- Spark decode pipeline ----------------------------------------------

def test_decode_images_matches_generator(spark):
    docs = spark.range(0, 8).select(F.col("id").alias("doc_id"))
    out = decode_images(attach_bmp(docs)).orderBy("doc_id").collect()
    assert len(out) == 8
    for row in out:
        d = row["doc_id"]
        assert (row["width"], row["height"]) == (6, 4)
        # top-left pixel (r=0, c=0) — order-sensitive
        assert row["px00_r"] == (d * 7) % 256
        assert row["px00_g"] == (d * 13) % 256
        assert row["px00_b"] == (d * 31) % 256
        exp_r = sum((d * 7 + r * 16 + c) % 256
                    for r in range(4) for c in range(6))
        assert row["sum_r"] == exp_r


# --- HTML extraction -----------------------------------------------------

def _extract_one(spark, html: str) -> str:
    df = spark.createDataFrame([(html,)], "html string")
    return extract_text(df, "html", "text").head()["text"]


def test_extract_strips_tags_and_blocks(spark):
    html = (
        "<html><head><style>body { x: 1 }</style>"
        "<script>if (1 < 2) { alert(1); }</script></head>"
        "<body><h1>Title</h1><p>hello   <b>world</b></p></body></html>"
    )
    assert _extract_one(spark, html) == "Title hello world"


def test_extract_decodes_entities_single_pass(spark):
    # &amp;lt; must decode to the LITERAL text "&lt;", not "<"
    html = "<p>a &lt;b&gt; &quot;c&quot; &#39;d&#39; &amp;lt; &nbsp;e</p>"
    assert _extract_one(spark, html) == 'a <b> "c" \'d\' &lt; e'


def test_extract_binary_input(spark):
    df = spark.createDataFrame([("<p>x</p>",)], "s string").select(
        F.encode("s", "utf-8").alias("html")
    )
    assert extract_text(df, "html", "text").head()["text"] == "x"


def test_extract_webtext_fixture_byte_identical(spark):
    """North-star invariant: extraction over the synthetic crawl table
    reproduces the text column byte-for-byte up to whitespace collapse
    (the extractor normalizes whitespace runs; the analyzer splits on
    whitespace, so analyzer output — what the index sees — is
    byte-identical, asserted below via the tokenizer)."""
    from toshi_spark.analyzer import tokenize
    from toshi_spark.fixtures import synth_webtext

    pages = synth_webtext(spark, 50, seed=7)
    out = extract_text(pages, "html", "extracted")
    norm = F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))
    assert out.filter(F.col("extracted") != norm).count() == 0
    # analyzer-level byte identity: token streams match exactly
    for row in out.select("extracted", "text").collect():
        assert tokenize(row["extracted"]) == tokenize(row["text"])


# --- Near-dup clustering (connected components) --------------------------

def test_dedup_clusters_known_graphs(spark):
    from toshi_spark.pipeline.dedup import dedup_clusters

    # chain 1-2-3, triangle 10-11-12, pair 20-21, long chain 30..40
    pairs = [(1, 2), (2, 3), (10, 11), (11, 12), (10, 12), (20, 21)]
    pairs += [(i, i + 1) for i in range(30, 40)]
    df = spark.createDataFrame(pairs, "a long, b long")
    got = {r["doc_id"]: r["cluster_id"]
           for r in dedup_clusters(df).collect()}
    assert {k: v for k, v in got.items() if k < 10} == {1: 1, 2: 1, 3: 1}
    assert {k: v for k, v in got.items() if 10 <= k < 20} == {
        10: 10, 11: 10, 12: 10}
    assert {k: v for k, v in got.items() if 20 <= k < 30} == {20: 20, 21: 20}
    # diameter-10 chain: multi-round propagation must fully converge
    assert {got[i] for i in range(30, 41)} == {30}


# --- Repetition signals --------------------------------------------------

def test_repetition_stats_known_values(spark):
    from toshi_spark.pipeline.textstats import repetition_stats

    docs = spark.createDataFrame(
        [
            # 4 lines, 2 distinct -> dup_line_frac 0.5;
            # bigrams of "a b a b a b": (a b)x3 (b a)x2 -> top 3/5
            (0, "a b a b\na b a b\nx\nx"),
            (1, "unique line one\nunique line two"),   # no dup lines
            (2, "word"),                                # <2 tokens
            (3, ""),                                    # empty
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert got[0]["dup_line_frac"] == 0.5
    # doc 0 tokens: a b a b a b a b x x -> bigrams: (a b)x4,(b a)x3,(b x),(x x)
    assert got[0]["top_bigram_frac"] == round(4 / 9, 4)
    assert got[1]["dup_line_frac"] == 0.0
    assert got[2]["top_bigram_frac"] == 0.0
    assert got[3]["dup_line_frac"] == 0.0 and got[3]["top_bigram_frac"] == 0.0


# --- PII scrub ------------------------------------------------------------

def test_pii_scrub_known_values(spark):
    from toshi_spark.pipeline.textstats import pii_scrub

    docs = spark.createDataFrame(
        [
            (0, "mail a.b-c_d@sub.example.org now"),
            (1, "server at 192.168.0.1 and 10.0.0.255"),
            (2, "ssn 123-45-6789 but not 1234-56-789"),
            (3, "clean text with no pii at all"),
            (4, "both x@y.co and 8.8.8.8"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in pii_scrub(docs).collect()}
    assert got[0]["n_email"] == 1
    assert got[0]["redacted"] == "mail <EMAIL> now"
    assert got[1]["n_ipv4"] == 2
    assert got[1]["redacted"] == "server at <IPV4> and <IPV4>"
    assert got[2]["n_ssn"] == 1
    assert "<SSN>" in got[2]["redacted"]
    assert got[3]["n_email"] == got[3]["n_ipv4"] == got[3]["n_ssn"] == 0
    assert got[3]["redacted"] == "clean text with no pii at all"
    assert got[4]["redacted"] == "both <EMAIL> and <IPV4>"


# --- Boilerplate line removal --------------------------------------------

def test_boilerplate_detect_and_strip(spark):
    from toshi_spark.pipeline.webtext import boilerplate_lines, strip_boilerplate

    rows = [(i, f"unique opener {i}\nCOMMON FOOTER\n  COMMON FOOTER  \nbody {i}")
            for i in range(20)]
    rows.append((99, "COMMON FOOTER"))  # doc that is ALL boilerplate
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bp = boilerplate_lines(docs, min_docs=10)
    got = {r["line"] for r in bp.collect()}
    assert got == {"COMMON FOOTER"}  # trimmed variants count as one line
    out = {r["doc_id"]: r["clean"]
           for r in strip_boilerplate(docs, bp).collect()}
    assert out[3] == "unique opener 3\nbody 3"
    assert out[99] == ""  # fully-boilerplate doc survives as empty
    assert len(out) == 21


# --- Document chunking -----------------------------------------------------

def test_chunk_documents_overlap(spark):
    from toshi_spark.pipeline.textstats import chunk_documents

    text = " ".join(f"t{i}" for i in range(95))
    docs = spark.createDataFrame([(0, text), (1, "only three tokens")],
                                 "doc_id long, text string")
    out = chunk_documents(docs, chunk_tokens=50, stride=40)
    rows = {(r["doc_id"], r["chunk_no"]): r for r in out.collect()}
    # doc 0: starts at 0, 40, 80 -> 3 chunks; last one is short
    assert {c for (d, c) in rows if d == 0} == {0, 1, 2}
    assert rows[(0, 0)]["n_chunk_tokens"] == 50
    assert rows[(0, 0)]["chunk"].split()[0] == "t0"
    assert rows[(0, 1)]["chunk"].split()[0] == "t40"  # 10-token overlap
    assert rows[(0, 1)]["chunk"].split()[-1] == "t89"
    assert rows[(0, 2)]["n_chunk_tokens"] == 15
    # short doc: single chunk, whole doc
    assert rows[(1, 0)]["chunk"] == "only three tokens"
    assert (1, 1) not in rows
