"""Text analysis: the Tantivy ``default`` analyzer chain, vectorized.

Semantics (reference evidence)
------------------------------
Toshi schemas select ``tokenizer: "default"`` (reference:
``requests.http:15``, ``toshi-server/src/handlers/index.rs:86``); Toshi
registers tokenizers at ``toshi-server/src/lib.rs:57-77`` and otherwise
delegates analysis to Tantivy 0.19, whose public documentation defines
the ``default`` chain as:

1. **SimpleTokenizer** — split the text into maximal runs of Unicode
   alphanumeric characters (``char::is_alphanumeric``: Alphabetic or
   Nd/Nl/No).  Underscore and punctuation are separators.  Each raw
   token gets a position = its 0-based index in the raw token stream.
2. **RemoveLongFilter(limit=40)** — drop tokens whose UTF-8 byte length
   is >= 40 (kept iff ``len_bytes < 40``).  Dropped tokens still consume
   a position (the filter does not renumber).
3. **LowerCaser** — Unicode lowercase.

Python mapping: ``str.isalnum()`` mirrors Rust ``char::is_alphanumeric``
(both are Alphabetic|Nd|Nl|No up to minor Unicode-category edge cases);
``str.lower()`` mirrors ``char::to_lowercase``.  The fast path uses
``\\w+`` regex runs and falls back to an exact per-char regroup whenever
a run contains characters Rust would treat as separators (underscore,
combining marks).  Golden-file tests pin byte-identical output.

Everything here is Arrow-batched (pandas UDF / mapInPandas) — no
per-row Python UDFs in the Spark plan.
"""

from __future__ import annotations

import itertools
import re
from collections.abc import Iterator

import pandas as pd

TOKEN_BYTE_LIMIT = 40  # Tantivy RemoveLongFilter::limit(40)

_WORD_RE = re.compile(r"\w+", re.UNICODE)
_ASCII_SAFE = re.compile(r"[0-9A-Za-z]+\Z")


def raw_tokens(text: str) -> Iterator[str]:
    """Maximal runs of Unicode-alphanumeric chars, in order (pre-filter)."""
    for m in _WORD_RE.finditer(text):
        tok = m.group()
        if _ASCII_SAFE.match(tok) or tok.isalnum():
            yield tok
        else:
            # \w matched chars Rust's is_alphanumeric would not
            # (underscore, combining marks): regroup exactly.
            for is_alnum, grp in itertools.groupby(tok, key=str.isalnum):
                if is_alnum:
                    yield "".join(grp)


def tokenize(text: str) -> list[tuple[str, int]]:
    """Full analyzer chain → list of (term, position)."""
    out: list[tuple[str, int]] = []
    for pos, tok in enumerate(raw_tokens(text)):
        if len(tok.encode("utf-8")) < TOKEN_BYTE_LIMIT:
            out.append((tok.lower(), pos))
    return out


def terms_only(text: str) -> list[str]:
    return [t for t, _ in tokenize(text)]


def analyze_partition(
    batches: Iterator[pd.DataFrame],
    id_col: str = "doc_id",
    text_col: str = "text",
    field: str = "text",
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (id, text) batches → per-(doc, term) postings.

    Emits one output row per distinct term per document — the map-side
    partial aggregation of the inverted index.  Doing the doc-local
    (term → tf, positions) aggregation here (instead of exploding one
    row per token and shuffling) shrinks shuffle volume by the average
    term frequency, which is the difference between shuffling ~#tokens
    rows and ~#distinct-(doc,term) rows at 100 TB.

    Output schema: doc_id long, field string, term string, tf int,
    positions array<int>, doc_len int (doc_len repeated per row for a
    downstream doclens reduction without a second scan).
    """
    for pdf in batches:
        ids: list[int] = []
        fields: list[str] = []
        terms: list[str] = []
        tfs: list[int] = []
        positions: list[list[int]] = []
        lens: list[int] = []
        for doc_id, text in zip(pdf[id_col].values, pdf[text_col].values):
            toks = tokenize(text if isinstance(text, str) else "")
            agg: dict[str, list[int]] = {}
            for term, pos in toks:
                agg.setdefault(term, []).append(pos)
            n = len(toks)
            for term, plist in agg.items():
                ids.append(int(doc_id))
                fields.append(field)
                terms.append(term)
                tfs.append(len(plist))
                positions.append(plist)
                lens.append(n)
            if not agg:  # empty doc still needs a doclen row
                ids.append(int(doc_id))
                fields.append(field)
                terms.append("")
                tfs.append(0)
                positions.append([])
                lens.append(0)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "field": fields,
                "term": terms,
                "tf": pd.Series(tfs, dtype="int32"),
                "positions": positions,
                "doc_len": pd.Series(lens, dtype="int32"),
            }
        )


ANALYZE_SCHEMA = (
    "doc_id long, field string, term string, tf int, "
    "positions array<int>, doc_len int"
)
