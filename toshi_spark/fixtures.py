"""Deterministic test fixtures.

1. ``toshi_fixture_docs`` — the reference's 5-doc unit-test index,
   rows copied verbatim from ``toshi-server/src/commit.rs:56-60`` (the
   contract for every hit-count assertion in
   ``toshi-server/src/handlers/search.rs:59-197``).
2. ``synth_webtext`` — a Common-Crawl-style corpus matching
   BASELINE.json's input_hint: (url, warc_ts, html, text, lang).
   Generated distributed (spark.range + mapInPandas) with per-row
   seeding, so the bytes are identical regardless of parallelism or
   partitioning — the per-url byte-identity invariant.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from datetime import datetime, timezone

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

TOSHI_FIXTURE_ROWS = [
    # (test_text, test_i64, test_u64, test_unindex, test_facet)
    ("Test Document 1", 2014, 10, "no", "/cat/cat2"),
    ("Test Dockument 2", -2015, 11, "yes", "/cat/cat2"),
    ("Test Duckiment 3", 2016, 12, "noo", "/cat/cat3"),
    ("Test Document 4", -2017, 13, "yess", "/cat/cat4"),
    ("Test Document 5", 2018, 14, "nooo", "/dog/cat2"),
]

TOSHI_FIXTURE_SCHEMA = (
    "doc_id long, test_text string, test_i64 long, test_u64 long, "
    "test_unindex string, test_facet string"
)


def toshi_fixture_docs(spark: SparkSession) -> DataFrame:
    rows = [(i, *r) for i, r in enumerate(TOSHI_FIXTURE_ROWS)]
    return spark.createDataFrame(rows, TOSHI_FIXTURE_SCHEMA)


# ---------------------------------------------------------------- webtext

_EPOCH = int(datetime(2020, 1, 1, tzinfo=timezone.utc).timestamp())
_LANGS = ["en"] * 17 + ["de", "fr", "zh"]

# Zipf-ish vocabulary: rank r gets weight 1/(r+1); head terms dominate
# so head-term skew (salting, block-max pruning) is exercised for real.
_VOCAB_SIZE = 2000
_LONG_TOKEN = "x" * 45  # dropped by the 40-byte analyzer rule


def _vocab(n: int = _VOCAB_SIZE) -> list[str]:
    return [f"w{i}" for i in range(n)]


def _doc_seed(global_seed: int, i: int) -> int:
    h = hashlib.md5(f"{global_seed}:{i}".encode()).digest()
    return int.from_bytes(h[:4], "little")


def _gen_batch(idx: np.ndarray, seed: int) -> pd.DataFrame:
    vocab = np.array(_vocab())
    ranks = np.arange(1.0, len(vocab) + 1.0)
    probs = (1.0 / ranks) / np.sum(1.0 / ranks)
    urls, tss, htmls, texts, langs = [], [], [], [], []
    for i in idx:
        i = int(i)
        rng = np.random.RandomState(_doc_seed(seed, i))
        n_tokens = int(10 + rng.zipf(1.3) % 1990) if rng.rand() < 0.5 else int(
            10 + rng.randint(0, 490)
        )
        words = list(vocab[rng.choice(len(vocab), size=n_tokens, p=probs)])
        words.append(f"marker{i:08d}")  # unique tail term per doc
        if i % 97 == 0:
            words.insert(0, _LONG_TOKEN)  # analyzer must drop, position gap
        sep_pool = [" ", " ", " ", ", ", ". ", "; ", " - ", "\n"]
        seps = rng.choice(len(sep_pool), size=len(words))
        text = "".join(
            w + sep_pool[int(s)] for w, s in zip(words, seps)
        ).rstrip()
        url = f"https://example-{i % 1000:04d}.test/page/{i:010d}"
        urls.append(url)
        tss.append(datetime.fromtimestamp(_EPOCH + i, tz=timezone.utc))
        htmls.append(f"<html><body>{text}</body></html>".encode("utf-8"))
        texts.append(text)
        langs.append(_LANGS[i % len(_LANGS)])
    return pd.DataFrame(
        {"url": urls, "warc_ts": tss, "html": htmls, "text": texts, "lang": langs}
    )


WEBTEXT_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def synth_webtext(
    spark: SparkSession, n_docs: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Deterministic synthetic web corpus (BASELINE.json input_hint shape)."""
    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism
    base = spark.range(0, n_docs, 1, partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _gen_batch(pdf["id"].values, seed)

    return base.mapInPandas(gen, WEBTEXT_SCHEMA)


# ------------------------------------------------- multiscript webtext
#
# Deterministic NON-ASCII corpus slice: real crawls are 30-50%
# non-English, and an ASCII-only fixture never exercises the Unicode
# analyzer kernel (analyzer._analyze_unicode_batch), CJK runs, case
# folding beyond +32, or combining-mark splits end-to-end.  Same
# per-row seeding ⇒ byte-identical at any parallelism.

_CYR_VOCAB = [f"слово{i}" for i in range(200)] + [
    "привет", "мир", "поиск", "данные", "система", "ёжик", "быстрый",
]
_CJK_CHARS = "日本語検索系統索引高速言葉漢字文書処理機械学習"
_LAT1_VOCAB = ["grüße", "straße", "café", "naïve", "résumé", "señor",
               "über", "çalış", "ölçü", "données"]
_GREEK_VOCAB = ["αναζήτηση", "σύστημα", "ταχύτητα", "ευρετήριο",
                "δεδομένα", "γλώσσα"]
_COMBINING = "x́ÿ"  # combining marks split alnum runs


def _gen_batch_multiscript(idx: np.ndarray, seed: int) -> pd.DataFrame:
    ascii_vocab = _vocab(400)
    urls, tss, htmls, texts, langs = [], [], [], [], []
    for i in idx:
        i = int(i)
        rng = np.random.RandomState(_doc_seed(seed * 31 + 7, i))
        n_tokens = int(20 + rng.randint(0, 120))
        words = []
        for _ in range(n_tokens):
            b = rng.rand()
            if b < 0.30:
                words.append(_CYR_VOCAB[rng.randint(0, len(_CYR_VOCAB))])
            elif b < 0.50:
                k = rng.randint(2, 7)
                s = rng.randint(0, len(_CJK_CHARS) - k)
                words.append(_CJK_CHARS[s:s + k])
            elif b < 0.62:
                words.append(_LAT1_VOCAB[rng.randint(0, len(_LAT1_VOCAB))])
            elif b < 0.70:
                words.append(
                    _GREEK_VOCAB[rng.randint(0, len(_GREEK_VOCAB))]
                )
            elif b < 0.73:
                words.append(_COMBINING)
            else:
                words.append(ascii_vocab[rng.randint(0, len(ascii_vocab))])
        words.append(f"маркер{i:08d}")  # unique Cyrillic tail term
        if i % 41 == 0:
            words.insert(0, "ё" * 25)  # 50 UTF-8 bytes → analyzer drops
        sep_pool = [" ", " ", "、", ", ", ". ", "·", "\n"]
        seps = rng.choice(len(sep_pool), size=len(words))
        text = "".join(
            w + sep_pool[int(s)] for w, s in zip(words, seps)
        ).rstrip()
        url = f"https://uni-{i % 100:03d}.test/страница/{i:010d}"
        urls.append(url)
        tss.append(datetime.fromtimestamp(_EPOCH + i, tz=timezone.utc))
        htmls.append(f"<html><body>{text}</body></html>".encode("utf-8"))
        texts.append(text)
        langs.append(["ru", "ja", "de", "el", "en"][i % 5])
    return pd.DataFrame(
        {"url": urls, "warc_ts": tss, "html": htmls, "text": texts,
         "lang": langs}
    )


def synth_webtext_multiscript(
    spark: SparkSession, n_docs: int, seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Mixed-script web corpus (same schema as ``synth_webtext``):
    ~30% Cyrillic, ~20% CJK runs, Latin-1/Greek slices, combining
    marks, a per-doc Cyrillic marker term, and periodic over-40-byte
    Cyrillic tokens the analyzer must drop."""
    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism
    base = spark.range(0, n_docs, 1, partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _gen_batch_multiscript(pdf["id"].values, seed)

    return base.mapInPandas(gen, WEBTEXT_SCHEMA)


SITE_DOCS = 2048  # crawl locality: contiguous docs share a host


def _site_params(global_seed: int, site: int, vocab_len: int):
    """Deterministic per-site shape: page-length scale, topic words and
    burst rate — the host-level locality real crawls have (pages of one
    host share templates/length and subject matter)."""
    rng = np.random.RandomState(_doc_seed(global_seed * 7919 + 13, site))
    u = rng.rand()
    if u < 0.5:
        lo, hi = 15, 80  # link farms / stubs
    elif u < 0.8:
        lo, hi = 100, 400  # articles
    else:
        lo, hi = 600, 2000  # longform / dumps
    ranks = np.arange(1.0, vocab_len + 1.0)
    probs = (1.0 / ranks) / np.sum(1.0 / ranks)
    topics = rng.choice(vocab_len, size=3, replace=False, p=probs)
    burst = 0.2 + 0.3 * rng.rand()
    return lo, hi, topics, burst


def _gen_batch_skewed(idx: np.ndarray, seed: int,
                      site_docs: int = SITE_DOCS) -> pd.DataFrame:
    vocab = np.array(_vocab())
    ranks = np.arange(1.0, len(vocab) + 1.0)
    probs = (1.0 / ranks) / np.sum(1.0 / ranks)
    urls, tss, htmls, texts, langs = [], [], [], [], []
    site_cache: dict[int, tuple] = {}  # all site_docs docs share params
    for i in idx:
        i = int(i)
        site = i // site_docs
        if site not in site_cache:
            site_cache[site] = _site_params(seed, site, len(vocab))
        lo, hi, topics, burst = site_cache[site]
        rng = np.random.RandomState(_doc_seed(seed, i))
        n_tokens = int(rng.randint(lo, hi + 1))
        base = rng.choice(len(vocab), size=n_tokens, p=probs)
        topical = rng.rand(n_tokens) < burst
        base[topical] = topics[rng.randint(0, len(topics), topical.sum())]
        words = list(vocab[base])
        words.append(f"marker{i:08d}")
        sep_pool = [" ", " ", " ", ", ", ". ", "; ", " - ", "\n"]
        seps = rng.choice(len(sep_pool), size=len(words))
        text = "".join(
            w + sep_pool[int(s)] for w, s in zip(words, seps)
        ).rstrip()
        # url sorts by (site, page): assign_doc_ids(order_col="url")
        # then keeps each site's pages CONTIGUOUS in doc-id space —
        # the crawl-order locality that gives posting blocks distinct
        # impact profiles (short-page sites' blocks score high, long-
        # page sites' low) so block-max pruning has something to prune
        urls.append(f"https://site-{site:07d}.test/page/{i:010d}")
        tss.append(datetime.fromtimestamp(_EPOCH + i, tz=timezone.utc))
        htmls.append(f"<html><body>{text}</body></html>".encode("utf-8"))
        texts.append(text)
        langs.append(_LANGS[i % len(_LANGS)])
    return pd.DataFrame(
        {"url": urls, "warc_ts": tss, "html": htmls, "text": texts, "lang": langs}
    )


def synth_webtext_skewed(
    spark: SparkSession, n_docs: int, seed: int = 42,
    partitions: int | None = None, site_docs: int = SITE_DOCS,
) -> DataFrame:
    """Web corpus with HOST-LEVEL skew (same schema as synth_webtext).

    The flat generator's tf/doc-length variation is uncorrelated with
    doc order, so every posting block carries near-identical BM25
    impact bounds and block-max pruning has nothing to cut (measured
    0% in round 3).  Real crawls are different: pages of one host are
    adjacent in crawl order and share page-length scale and topic
    vocabulary.  This generator reproduces that — contiguous
    ``SITE_DOCS``-page sites with a per-site length class (15-80 /
    100-400 / 600-2000 tokens), 3 Zipf-drawn topic words and a 20-50%
    topic-burst rate — which is what gives blocks genuinely different
    (max_tfn, dl-range) bounds at build time.
    """
    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism
    base = spark.range(0, n_docs, 1, partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _gen_batch_skewed(pdf["id"].values, seed, site_docs)

    return base.mapInPandas(gen, WEBTEXT_SCHEMA)
