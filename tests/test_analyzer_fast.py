"""Vectorized-vs-scalar analyzer identity (analyzer._analyze_ascii_batch).

The default-chain builder path routes single ASCII strings through a
fully-vectorized numpy kernel and everything else through the scalar
loop (`analyze_arrow_batches`).  Both must be row-identical: the fast
path is a pure optimization, never a semantics change.  Golden-file
tests (test_analyzer.py) pin the scalar chain to Tantivy; these pin the
fast path to the scalar chain, closing the loop.
"""

from __future__ import annotations

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from toshi_spark.analyzer import (
    ANALYZERS,
    analyze_arrow_batches,
    analyze_doc,
    analyze_multi,
)


def _run_batch(texts, tokenizer="default"):
    ids = list(range(len(texts)))
    batch = pa.RecordBatch.from_arrays(
        [pa.array(ids, pa.int64()), pa.array(texts, pa.string())],
        names=["doc_id", "text"],
    )
    rows = []
    for rb in analyze_arrow_batches([batch], tokenizer=tokenizer):
        rows.extend(rb.to_pylist())
    return sorted(rows, key=lambda r: (r["doc_id"], r["term"]))


def _scalar_expect(texts):
    out = []
    for i, t in enumerate(texts):
        agg, n = analyze_multi(analyze_doc, t)
        if not agg:
            out.append(
                {"doc_id": i, "field": "text", "term": "", "tf": 0,
                 "positions": [], "doc_len": 0}
            )
        else:
            for term, plist in agg.items():
                out.append(
                    {"doc_id": i, "field": "text", "term": term,
                     "tf": len(plist), "positions": plist, "doc_len": n}
                )
    return sorted(out, key=lambda r: (r["doc_id"], r["term"]))


def test_fast_path_edge_cases():
    texts = [
        "hello world hello",          # repeated term
        "",                           # empty → sentinel
        "   \t\n ",                   # whitespace only → sentinel
        None,                         # null → sentinel
        "a_b_c d",                    # underscore regrouping
        "The THE the tHe",            # case folding merges terms
        "x" * 39 + " " + "y" * 40 + " z",  # RemoveLongFilter boundary
        "z" * 200,                    # single dropped token → sentinel
        "\x00embedded\x00nul toks",   # NUL inside a doc ≠ doc boundary
        "punct!@#sep,ara;ted",        # punctuation separators
        "digits 123 mix3d a1b2",      # alnum runs with digits
    ]
    assert _run_batch(texts) == _scalar_expect(texts)


def test_mixed_ascii_unicode_batch_routes_both_paths():
    # non-ASCII docs take the scalar path INSIDE the same call; rows
    # from both paths must stitch into one consistent result
    texts = ["pure ascii here", "über straße", "日本語のテキスト",
             "ascii again", "naïve café", ""]
    assert _run_batch(texts) == _scalar_expect(texts)


def test_fast_path_gate_is_identity_not_name():
    # a non-default tokenizer must never hit the ASCII kernel (en_stem
    # output differs: "running" → "run")
    rows = _run_batch(["running quickly"], tokenizer="en_stem")
    assert {r["term"] for r in rows} == {"run", "quick"}
    assert ANALYZERS["default"] is analyze_doc  # gate precondition


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.text(
                alphabet=st.characters(min_codepoint=0, max_codepoint=127),
                max_size=120,
            ),
            st.text(max_size=60),  # arbitrary unicode → scalar fallback
            st.none(),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_fast_path_fuzz_identity(texts):
    assert _run_batch(texts) == _scalar_expect(texts)


def test_fast_path_positions_skip_dropped_long_tokens():
    # positions index the RAW stream: the 40-byte token consumes
    # position 1 even though it is filtered out
    long_tok = "q" * 40
    rows = _run_batch([f"alpha {long_tok} beta alpha"])
    by_term = {r["term"]: r for r in rows}
    assert by_term["alpha"]["positions"] == [0, 3]
    assert by_term["beta"]["positions"] == [2]
    assert by_term["alpha"]["doc_len"] == 3  # kept tokens only


def test_fast_path_chunking_preserves_identity(monkeypatch):
    # force the int32-overflow guard to split the fast batch into many
    # kernel calls; stitched rows must equal the unchunked result
    import toshi_spark.analyzer as az

    texts = [f"alpha{i} beta gamma{i % 3}" for i in range(50)]
    expect = _run_batch(texts)
    monkeypatch.setattr(az, "FAST_CHUNK_BYTES", 16)
    assert _run_batch(texts) == expect


# ---------------------------------------------------- unicode kernel

UNICODE_GOLDEN = [
    "Привет МИР 123 ёжик",                 # Cyrillic + digits
    "Grüße STRASSE Çekoslovakya",          # Latin-1 / Turkish
    "日本語のテキストです 漢字",              # CJK runs
    "ΑΣΒ ΣΟΦΟΣ τέλος",                     # Greek: Σ → Final_Sigma rule
    "İstanbul İİ dotted",                  # İ: one-to-many lowercase
    "مرحبا بالعالم 42",                    # Arabic RTL + ASCII digits
    "한국어 텍스트",                          # Hangul
    "mixed ASCII و عربي and 日本",          # script-mixed doc
    "𝔘𝔫𝔦𝔠𝔬𝔡𝔢 astral 𐍈 text",             # astral → scalar leftover
    "x́ combining ÿz",          # combining marks separate
    "ё" * 25,                              # 50-byte token → dropped
    "Ɫ width Ɫ",                           # lowercase changes byte width
    "  nbsp seps",          # unicode spaces as separators
]


def test_unicode_kernel_golden_identity():
    assert _run_batch(UNICODE_GOLDEN) == _scalar_expect(UNICODE_GOLDEN)


def test_unicode_kernel_leftover_routing():
    # the kernel must vectorize the case-safe BMP docs and hand back
    # ONLY astral / case-unsafe docs for the scalar path
    from toshi_spark.analyzer import _analyze_unicode_batch

    texts = ["Привет мир", "ΣΟΦΟΣ", "astral 𐍈", "naïve café"]
    schema = pa.schema(
        [("doc_id", pa.int64()), ("field", pa.string()),
         ("term", pa.string()), ("tf", pa.int32()),
         ("positions", pa.list_(pa.int32())),
         ("doc_len", pa.int32())]
    )
    rb, leftovers = _analyze_unicode_batch(
        [0, 1, 2, 3], texts, "text", schema
    )
    assert sorted(i for i, _t in leftovers) == [1, 2]
    assert rb is not None
    assert sorted(set(rb.column(0).to_pylist())) == [0, 3]


def test_unicode_kernel_chunking_preserves_identity(monkeypatch):
    import toshi_spark.analyzer as az

    texts = [f"привет{i} мир{i % 3} ёж" for i in range(40)]
    expect = _run_batch(texts)
    monkeypatch.setattr(az, "FAST_CHUNK_BYTES", 64)  # uni budget = 16
    assert _run_batch(texts) == expect


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.one_of(
            # BMP-heavy multilingual text (the vectorized path).
            # Surrogates are excluded: Arrow strings are valid UTF-8,
            # so the kernel can never receive one from Spark (pyarrow
            # refuses to even build the test batch).
            st.text(
                alphabet=st.characters(
                    min_codepoint=0x20, max_codepoint=0xFFFF,
                    exclude_categories=("Cs",),
                ),
                max_size=80,
            ),
            # full-range text incl. astral (leftover path)
            st.text(max_size=40),
        ),
        min_size=1,
        max_size=10,
    )
)
def test_unicode_kernel_fuzz_identity(texts):
    assert _run_batch(texts) == _scalar_expect(texts)
