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
