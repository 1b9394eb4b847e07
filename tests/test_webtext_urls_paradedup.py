"""Unit tests for the round-5 web-pipeline operators: paragraph-level
dedup (CCNet/Gopher stage) and URL canonicalization (crawl-frontier
stage).  Oracle parity at sf0.01 is covered by test_oracle_parity;
these pin the hand-checkable semantics on tiny inputs."""

from toshi_spark.pipeline.dedup import paragraph_dedup
from toshi_spark.pipeline.webtext import canonicalize_urls


def test_paragraph_dedup_first_occurrence_wins(spark):
    # 2-token paragraphs; "a b" appears in doc 0 (idx 0), doc 1 (idx 0)
    # and again inside doc 0 (idx 2) — only doc 0 idx 0 survives.
    docs = spark.createDataFrame(
        [
            (0, "a b c d a b"),
            (1, "a b x y"),
            (2, "c d"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in paragraph_dedup(docs, para_tokens=2).collect()
    }
    assert out[0]["n_paras"] == 3 and out[0]["n_kept"] == 2
    assert out[0]["kept_text"] == "a b c d"
    assert out[1]["n_paras"] == 2 and out[1]["n_kept"] == 1
    assert out[1]["kept_text"] == "x y"
    # doc 2's only paragraph "c d" was first seen in doc 0
    assert out[2]["n_kept"] == 0 and out[2]["kept_text"] == ""


def test_paragraph_dedup_partial_tail_and_empty(spark):
    docs = spark.createDataFrame(
        [(0, "p q r"), (1, "")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in paragraph_dedup(docs, para_tokens=2).collect()
    }
    # 3 tokens / width 2 → paragraphs "p q" and the partial tail "r"
    assert out[0]["n_paras"] == 2 and out[0]["kept_text"] == "p q r"
    # empty text → one empty paragraph, kept (first occurrence)
    assert out[1]["n_paras"] == 1 and out[1]["n_kept"] == 1
    assert out[1]["kept_text"] == ""


def test_canonicalize_urls_rules(spark):
    rows = [
        # www + default https port + fragment + utm + unsorted query
        (0, "HTTPS://WWW.Example.COM:443/A/b/?utm_source=x&b=2&a=1#f"),
        # http default port, no query, trailing slashes collapse
        (1, "http://Example.com:80/path///"),
        # explicit non-default port survives; root path stays '/'
        (2, "http://sub.example.com:8080"),
        # https scheme must NOT strip :80 (non-default for https)
        (3, "https://example.com:80/x"),
    ]
    pages = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r["doc_id"]: r for r in canonicalize_urls(pages).collect()}
    assert out[0]["canonical_url"] == "https://example.com/A/b?a=1&b=2"
    assert out[0]["host"] == "example.com"
    assert out[1]["canonical_url"] == "http://example.com/path"
    assert out[2]["canonical_url"] == "http://sub.example.com:8080/"
    assert out[2]["host"] == "sub.example.com:8080"
    assert out[3]["canonical_url"] == "https://example.com:80/x"


def test_substring_dedup_planted_spans(spark):
    from toshi_spark.pipeline.dedup import substring_dedup

    shared = " ".join(f"s{i}" for i in range(20))
    docs = spark.createDataFrame(
        [
            (1, "a0 a1 a2 " + shared + " a3 a4"),
            (2, "b0 b1 b2 b3 b4 " + shared + " b5"),
            (3, " ".join(["x0 x1 x2 x3 x4 x5 x6 x7"] * 4)),
            (4, "short doc"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in substring_dedup(docs, k=8).collect()}
    # doc 1 holds every first occurrence — untouched
    assert out[1]["n_spans"] == 0 and out[1]["dup_tokens"] == 0
    assert out[1]["clean_text"].split(" ")[3:23] == shared.split(" ")
    # doc 2 loses exactly the 20-token shared region (windows
    # straddling the boundary are unique, so the span is tight)
    assert out[2]["n_spans"] == 1 and out[2]["dup_tokens"] == 20
    assert out[2]["clean_text"] == "b0 b1 b2 b3 b4 b5"
    # self-repetition collapses to the first period: the duplicated
    # windows 1..24 merge into one maximal span [1, 31]
    assert out[3]["n_spans"] == 1 and out[3]["dup_tokens"] == 24
    assert out[3]["clean_text"] == "x0 x1 x2 x3 x4 x5 x6 x7"
    # shorter than k → no windows, passes through
    assert out[4]["n_spans"] == 0 and out[4]["clean_text"] == "short doc"


def test_substring_dedup_adjacent_windows_fuse(spark):
    from toshi_spark.pipeline.dedup import substring_dedup

    # doc 2 repeats doc 0's tokens 0-3 and doc 1's tokens 0-3 back to
    # back: two k=4 duplicate windows at pos 0 and pos 4 — adjacent,
    # not overlapping — must fuse into ONE maximal span [0, 7]
    docs = spark.createDataFrame(
        [
            (0, "p0 p1 p2 p3 zz0 zz1 zz2 zz3"),
            (1, "q0 q1 q2 q3 yy0 yy1 yy2 yy3"),
            (2, "p0 p1 p2 p3 q0 q1 q2 q3"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in substring_dedup(docs, k=4).collect()}
    assert out[2]["n_spans"] == 1
    assert out[2]["dup_tokens"] == 8
    assert out[2]["clean_text"] == ""
