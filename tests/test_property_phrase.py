"""Property-based checks (hypothesis) for the phrase path + BMP codec.

The phrase compiler was rewritten to a single-scan groupBy plan; these
properties pit it against a brute-force positional scan over the same
token lists, across randomized phrases (including repeated-term
phrases, which exercise the term→positions map with duplicate anchor
terms).  One index is built per module; each example is one query.
"""

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from toshi_spark.pipeline.multimodal import decode_bmp, encode_bmp

VOCAB = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]


def _corpus_tokens() -> list[list[str]]:
    rng = np.random.default_rng(1234)
    docs = []
    for _ in range(60):
        n = int(rng.integers(0, 14))
        docs.append([VOCAB[int(i)] for i in rng.integers(0, len(VOCAB), n)])
    # guarantee some exact phrase repeats and adjacent duplicates
    docs.append(["alpha", "alpha", "beta", "alpha", "alpha", "beta"])
    docs.append(["zeta", "zeta", "zeta"])
    return docs


@pytest.fixture(scope="module")
def phrase_ix(spark):
    from toshi_spark.engine import FullTextIndex
    from toshi_spark.schema import FieldSpec, IndexSchema

    docs = _corpus_tokens()
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, body string",
    )
    schema = IndexSchema([
        FieldSpec("body", "text", stored=True, indexed=True,
                  positions=True),
    ])
    ix = FullTextIndex.build(spark, df, schema, id_col="doc_id",
                             name="prop_phrase")
    return ix, docs


def _brute_phrase_docs(docs: list[list[str]], phrase: list[str]) -> set:
    out = set()
    for i, toks in enumerate(docs):
        for p in range(len(toks) - len(phrase) + 1):
            if toks[p:p + len(phrase)] == phrase:
                out.add(i)
                break
    return out


@settings(max_examples=25, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(phrase=st.lists(st.sampled_from(VOCAB), min_size=2, max_size=4))
def test_phrase_matches_bruteforce(phrase_ix, phrase):
    from toshi_spark.query.compiler import Compiler
    from toshi_spark.query.dsl import PhraseQuery

    ix, docs = phrase_ix
    got = {
        r["doc_id"]
        for r in Compiler(ix).compile(PhraseQuery("body", phrase)).collect()
    }
    assert got == _brute_phrase_docs(docs, phrase)


@settings(max_examples=25, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(term=st.sampled_from(VOCAB))
def test_term_matches_bruteforce(phrase_ix, term):
    from toshi_spark.query.compiler import Compiler
    from toshi_spark.query.dsl import ExactTerm

    ix, docs = phrase_ix
    got = {
        r["doc_id"]
        for r in Compiler(ix).compile(ExactTerm(field="body",
                                                value=term)).collect()
    }
    assert got == {i for i, toks in enumerate(docs) if term in toks}


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=13),
    h=st.integers(min_value=1, max_value=9),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_bmp_roundtrip_property(w, h, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_bmp(encode_bmp(px)), px)


@settings(max_examples=20, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(
    must=st.lists(st.sampled_from(VOCAB), max_size=2, unique=True),
    should=st.lists(st.sampled_from(VOCAB), max_size=2, unique=True),
    must_not=st.lists(st.sampled_from(VOCAB), max_size=1, unique=True),
)
def test_bool_matches_set_algebra(phrase_ix, must, should, must_not):
    """Single-scan bool fast path vs brute-force set algebra.

    Semantics (Tantivy): docs containing ALL must terms, minus docs
    with any must_not term; with no must clauses, docs matching any
    should term (minus must_not).  No positive clause → no scorer →
    empty result.
    """
    from toshi_spark.query.compiler import Compiler
    from toshi_spark.query.dsl import BoolQuery, ExactTerm

    ix, docs = phrase_ix
    q = BoolQuery(
        must=[ExactTerm(field="body", value=t) for t in must],
        should=[ExactTerm(field="body", value=t) for t in should],
        must_not=[ExactTerm(field="body", value=t) for t in must_not],
    )
    got = {r["doc_id"] for r in Compiler(ix).compile(q).collect()}

    def docs_with(t):
        return {i for i, toks in enumerate(docs) if t in toks}

    if must:
        exp = set(range(len(docs)))
        for t in must:
            exp &= docs_with(t)
    elif should:
        exp = set()
        for t in should:
            exp |= docs_with(t)
    else:
        exp = set()
    for t in must_not:
        exp -= docs_with(t)
    assert got == exp


# --- Raw-parser fuzz: parse never crashes with a non-QueryError ----------

_RAW_ATOMS = [
    "alpha", "beta", '"alpha beta"', "body:alpha", "body:(alpha beta)",
    "alpha^2", "al*a", "a?pha", "alpha~1", "body:[1 TO 5]", "-alpha",
    "+beta", "(", ")", "AND", "OR", "NOT", ":", "^", "~", "*", '"',
    "[", "]", "TO", "body:", "", " ",
]


@settings(max_examples=150, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(parts=st.lists(st.sampled_from(_RAW_ATOMS), min_size=1, max_size=6))
def test_raw_parser_total(phrase_ix, parts):
    """Any token soup either parses to a DSL tree or raises the pinned
    QueryError — never an unhandled exception.  Parsed trees must also
    COMPILE (the parser may not emit nodes the compiler rejects)."""
    from toshi_spark.query.compiler import Compiler
    from toshi_spark.query.raw import parse_raw
    from toshi_spark.schema import QueryError

    ix, _ = phrase_ix
    raw = " ".join(parts)
    try:
        q = parse_raw(raw, ix.schema)
    except QueryError:
        return
    try:
        Compiler(ix).compile(q)
    except QueryError:
        pass  # e.g. range over a text field — pinned error, fine
