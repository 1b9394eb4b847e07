"""Port of the reference's handler-level query tests.

Every assertion here mirrors one in
``/root/reference/toshi-server/src/handlers/search.rs:59-197`` or the
DSL validation tests in toshi-types (exact hit counts / error messages
are the contract — SURVEY.md §5).
"""

import pytest

from toshi_spark.engine import FullTextIndex
from toshi_spark.fixtures import toshi_fixture_docs
from toshi_spark.query.dsl import parse_search
from toshi_spark.schema import TOSHI_FIXTURE_SCHEMA_SPECS, QueryError


@pytest.fixture(scope="module")
def index(spark):
    return FullTextIndex.build(
        spark, toshi_fixture_docs(spark), TOSHI_FIXTURE_SCHEMA_SPECS,
        id_col="doc_id", name="test_index",
    )


def run(index, body: dict):
    return index.search_json(body)


def test_term_query(index):  # search.rs:59-68
    r = run(index, {"query": {"term": {"test_text": "document"}}, "limit": 10})
    assert r.hits == 3


def test_term_query_not_reanalyzed(index):
    # query value is used verbatim (mod.rs:221): capitalized → no match
    r = run(index, {"query": {"term": {"test_text": "Document"}}})
    assert r.hits == 0


def test_phrase_query(index):  # search.rs:70-80
    r = run(index, {
        "query": {"phrase": {"test_text": {"terms": ["test", "document"]}}},
        "limit": 10,
    })
    assert r.hits == 3


def test_fuzzy_query(index):  # search.rs:141-152
    r = run(index, {
        "query": {"fuzzy": {"test_text": {"value": "document", "distance": 0,
                                          "transposition": False}}},
        "limit": 10,
    })
    assert r.hits == 3
    assert all(d.score == 1.0 for d in r.docs)  # automaton const scorer


def test_fuzzy_distance_2(index):
    # document/dockument/duckiment: dockument is distance 1, duckiment 3
    r = run(index, {
        "query": {"fuzzy": {"test_text": {"value": "document", "distance": 2}}},
    })
    assert r.hits == 4


def test_regex_query(index):  # search.rs:176-184
    r = run(index, {"query": {"regex": {"test_text": "d[ou]{1}c[k]?ument"}}})
    assert r.hits == 4


def test_bad_regex(index):  # regex.rs:54-62
    with pytest.raises(QueryError):
        run(index, {"query": {"regex": {"test_text": "[(.!"}}})


def test_inclusive_range_query(index):  # search.rs:154-163
    r = run(index, {"query": {"range": {"test_i64": {"gte": 2012, "lte": 2015}}}})
    assert r.hits == len(r.docs) == 1
    assert abs(r.docs[0].score - 1.0) < 1e-9
    assert r.docs[0].doc["test_i64"] == 2014


def test_exclusive_range_query(index):  # search.rs:165-174
    r = run(index, {"query": {"range": {"test_i64": {"gt": 2012, "lt": 2015}}}})
    assert r.hits == 1
    assert abs(r.docs[0].score - 1.0) < 1e-9


def test_exclusive_beats_inclusive(index):  # range.rs:131-153 precedence
    r = run(index, {"query": {"range": {"test_i64": {
        "gt": 2014, "gte": 2014, "lt": 2017, "lte": 2018}}}})
    # effective (2014, 2017): matches only 2016
    assert r.hits == 1
    assert r.docs[0].doc["test_i64"] == 2016


def test_impossible_range_ok(index):  # range.rs:220-229
    r = run(index, {"query": {"range": {"test_u64": {"gte": 10, "lte": 1}}}})
    assert r.hits == 0


def test_range_float_error(index):  # range.rs:196-206
    with pytest.raises(QueryError, match="invalid type"):
        run(index, {"query": {"range": {"test_i64": {"gte": 3.14}}}})


def test_range_negative_u64_error(index):  # range.rs:207-218
    with pytest.raises(QueryError, match="expected u64"):
        run(index, {"query": {"range": {"test_u64": {"gte": -1}}}})


def test_range_on_text_field_error(index):  # range.rs:162-171 dispatch
    with pytest.raises(QueryError, match="Invalid field type"):
        run(index, {"query": {"range": {"test_text": {"gte": 1}}}})


def test_bool_query(index):  # search.rs:186-197
    r = run(index, {"query": {"bool": {
        "must": [{"term": {"test_text": "document"}}],
        "must_not": [{"range": {"test_i64": {"gt": 2017}}}],
    }}})
    assert r.hits == 2


def test_bool_rejects_nested_bool(index):  # boolean.rs:63-75
    with pytest.raises(QueryError, match="Invalid type for boolean query"):
        run(index, {"query": {"bool": {
            "must": [{"bool": {"must": [{"term": {"test_text": "document"}}]}}],
        }}})


def test_bool_minimum_should_match_dropped(index):  # boolean.rs:47-61 quirk
    r = run(index, {"query": {"bool": {
        "should": [{"term": {"test_text": "document"}},
                   {"term": {"test_text": "duckiment"}}],
        "minimum_should_match": 2, "boost": 5.0,
    }}})
    # if minimum_should_match were applied, hits would be 0
    assert r.hits == 4


def test_unknown_field_error(index):  # search.rs:104-111
    with pytest.raises(QueryError, match="Unknown field: asdf"):
        run(index, {"query": {"term": {"asdf": "Document"}}})


def test_phrase_too_few_terms(index):  # phrase.rs:84-98
    with pytest.raises(QueryError, match="more than 1 term"):
        run(index, {"query": {"phrase": {"test_u64": {"terms": []}}}})


def test_phrase_offsets_mismatch(index):  # phrase.rs:100-113
    with pytest.raises(QueryError, match=r"\(2 and 1\)"):
        run(index, {"query": {"phrase": {"test_text": {
            "terms": ["asdf", "asdf2"], "offsets": [1]}}}})


def test_facets(index):  # search.rs:114-123
    r = run(index, {
        "query": {"term": {"test_text": "document"}},
        "facets": {"test_facet": ["/cat"]},
    })
    assert r.get_facets()[0]["field"] == "/cat/cat2"
    assert r.get_facets()[0]["value"] == 1
    assert r.get_facets()[1]["value"] == 1


def test_raw_query(index):  # search.rs:126-138
    r = run(index, {"query": {"raw": 'test_text:"Duckiment"'}})
    assert r.hits == len(r.docs) == 1
    assert r.docs[0].doc["test_text"] == "Test Duckiment 3"


def test_bad_raw_query_syntax(index):  # search.rs:82-90
    with pytest.raises(QueryError, match=r"Syntax Error"):
        run(index, {"query": {"raw": "asd*(@sq__"}})


def test_raw_unindexed_field(index):  # search.rs:93-101
    with pytest.raises(
        QueryError, match="The field 'test_unindex' is not declared as indexed"
    ):
        run(index, {"query": {"raw": "test_unindex:yes"}})


def test_raw_grouping_parens(index):
    # Tantivy's full QueryParser supports grouping (handle.rs:115-119)
    r = run(index, {"query": {"raw": "document AND (1 OR 4)"}, "limit": 10})
    assert r.hits == 2
    assert sorted(d.doc["test_text"] for d in r.docs) == [
        "Test Document 1", "Test Document 4"]


def test_raw_nested_grouping(index):
    r = run(index, {"query": {"raw": "(test AND (duckiment OR dockument))"},
                    "limit": 10})
    assert sorted(d.doc["test_text"] for d in r.docs) == [
        "Test Dockument 2", "Test Duckiment 3"]


def test_raw_boost_scales_scores(index):
    base = run(index, {"query": {"raw": "test_text:document"}, "limit": 10})
    boosted = run(index, {"query": {"raw": "test_text:document^2"}, "limit": 10})
    assert base.hits == boosted.hits == 3
    b = {d.doc["test_text"]: d.score for d in base.docs}
    for d in boosted.docs:
        assert d.score == 2 * b[d.doc["test_text"]]


def test_raw_boosted_group(index):
    base = run(index, {"query": {"raw": "(1 OR 4)"}, "limit": 10})
    half = run(index, {"query": {"raw": "(1 OR 4)^0.5"}, "limit": 10})
    b = {d.doc["test_text"]: d.score for d in base.docs}
    assert half.hits == 2
    for d in half.docs:
        assert d.score == 0.5 * b[d.doc["test_text"]]


def test_raw_intra_word_hyphen_is_not_negation(index):
    # 'test-document' analyzes to [test, document] (OR), it does NOT
    # become should(test) + must_not(document)
    r = run(index, {"query": {"raw": "test-document"}, "limit": 10})
    assert r.hits == 5  # every fixture doc contains 'test'


def test_raw_leading_minus_still_negates(index):
    r = run(index, {"query": {"raw": "document -duckiment"}, "limit": 10})
    assert r.hits == 3
    r2 = run(index, {"query": {"raw": "test -document"}, "limit": 10})
    assert sorted(d.doc["test_text"] for d in r2.docs) == [
        "Test Dockument 2", "Test Duckiment 3"]


@pytest.mark.parametrize("bad", [
    "(document",          # unbalanced open paren
    "document)",          # unbalanced close paren
    "document^",          # boost without a number
    "document ^2",        # free-standing boost operator
    "()",                 # empty group
    "test_text:(a",       # unbalanced field group
])
def test_raw_pinned_syntax_errors(index, bad):
    with pytest.raises(QueryError, match=r"Syntax Error"):
        run(index, {"query": {"raw": bad}})


def test_raw_wildcard_star(index):
    # ducki* expands via the regex automaton (ducki.* whole-term match)
    r = run(index, {"query": {"raw": "ducki*"}, "limit": 10})
    assert [d.doc["test_text"] for d in r.docs] == ["Test Duckiment 3"]
    assert r.docs[0].score == 1.0  # automaton queries const-score


def test_raw_wildcard_question(index):
    # ? is exactly one character: d?cument hits 'document' only
    # ('dockument' has two chars between d and cument)
    r = run(index, {"query": {"raw": "d?cument"}, "limit": 10})
    assert sorted(d.doc["test_text"] for d in r.docs) == [
        "Test Document 1", "Test Document 4", "Test Document 5"]
    # do?kument covers the k-variant
    r2 = run(index, {"query": {"raw": "do?kument"}, "limit": 10})
    assert [d.doc["test_text"] for d in r2.docs] == ["Test Dockument 2"]


def test_raw_bare_star_is_match_all(index):
    r = run(index, {"query": {"raw": "*"}, "limit": 10})
    assert r.hits == 5
    assert all(d.score == 1.0 for d in r.docs)


def test_raw_fuzzy_default_and_explicit_distance(index):
    # dockument~1: within one edit → document + dockument
    r1 = run(index, {"query": {"raw": "dockument~1"}, "limit": 10})
    assert sorted(d.doc["test_text"] for d in r1.docs) == [
        "Test Dockument 2", "Test Document 1", "Test Document 4",
        "Test Document 5"]
    # duckiment~ (Lucene default distance 2) → duckiment + dockument
    r2 = run(index, {"query": {"raw": "duckiment~"}, "limit": 10})
    assert sorted(d.doc["test_text"] for d in r2.docs) == [
        "Test Dockument 2", "Test Duckiment 3"]


def test_raw_field_grouping(index):
    # f:(a b): bare terms inside the group default to f
    r = run(index, {"query": {"raw": "test_text:(duckiment dockument)"},
                    "limit": 10})
    assert sorted(d.doc["test_text"] for d in r.docs) == [
        "Test Dockument 2", "Test Duckiment 3"]
    # grouped + boolean + boost compose
    r2 = run(index, {"query": {"raw": "test_text:(document AND 4)^2"},
                     "limit": 10})
    assert [d.doc["test_text"] for d in r2.docs] == ["Test Document 4"]


def test_all_docs_when_query_missing(index):  # search.rs:17 substitution
    r = run(index, {"limit": 10})
    assert r.hits == 5
    assert all(d.score == 1.0 for d in r.docs)


def test_default_limit_is_100(index):
    s = parse_search({"query": {"term": {"test_text": "document"}}})
    assert s.limit == 100


def test_sort_by_fast_field(index):  # handle.rs:82-92,127-134
    r = run(index, {"limit": 3, "sort_by": "test_u64"})
    # order by u64 value desc; "score" is the field value
    assert [d.doc["test_u64"] for d in r.docs] == [14, 13, 12]
    assert [d.score for d in r.docs] == [14.0, 13.0, 12.0]


def test_sort_by_non_fast_field_falls_back(index):
    # test_text is not fast+stored u64 → silent fallback to score order
    r = run(index, {"query": {"term": {"test_text": "document"}},
                    "sort_by": "test_text", "limit": 10})
    assert r.hits == 3


def test_limit_applied(index):
    r = run(index, {"query": {"term": {"test_text": "test"}}, "limit": 2})
    assert r.hits == 2


def test_bool_fast_path_equals_general(index, monkeypatch):
    """The single-scan all-terms boolean plan must match the
    clause-by-clause general plan exactly."""
    from toshi_spark.query.compiler import Compiler
    from toshi_spark.query.dsl import parse_query

    q = parse_query({"bool": {
        "must": [{"term": {"test_text": "test"}},
                 {"term": {"test_text": "document"}}],
        "must_not": [{"term": {"test_text": "duckiment"}}],
        "should": [{"term": {"test_text": "1"}},
                   {"term": {"test_text": "document"}}],
    }})
    comp = Compiler(index)
    fast = comp.compile(q)
    assert fast is not None
    monkeypatch.setattr(Compiler, "_compile_bool_terms_fast",
                        lambda self, q: None)
    general = Compiler(index).compile(q)
    a = sorted((r.doc_id, round(r.score, 10)) for r in fast.collect())
    b = sorted((r.doc_id, round(r.score, 10)) for r in general.collect())
    assert a == b and len(a) > 0


def test_bool_fast_path_should_only(index, monkeypatch):
    from toshi_spark.query.compiler import Compiler
    from toshi_spark.query.dsl import parse_query

    q = parse_query({"bool": {
        "should": [{"term": {"test_text": "document"}},
                   {"term": {"test_text": "dockument"}}],
        "must_not": [{"term": {"test_text": "4"}}],
    }})
    fast = Compiler(index).compile(q)
    monkeypatch.setattr(Compiler, "_compile_bool_terms_fast",
                        lambda self, q: None)
    general = Compiler(index).compile(q)
    a = sorted((r.doc_id, round(r.score, 10)) for r in fast.collect())
    b = sorted((r.doc_id, round(r.score, 10)) for r in general.collect())
    assert a == b and len(a) == 3  # docs 0,1,4 minus doc 3 ('4' term)


def test_raw_fielded_star_is_field_exists(spark):
    """`title:*` must match docs with ANY title term (field-exists,
    Lucene semantics), not every document."""
    from toshi_spark.engine import FullTextIndex
    from toshi_spark.schema import FieldSpec, IndexSchema

    schema = IndexSchema([
        FieldSpec("title", "text", stored=True, indexed=True),
        FieldSpec("body", "text", stored=True, indexed=True),
    ])
    docs = spark.createDataFrame(
        [(0, "hello title", "common body"),
         (1, "", "common body only")],
        "doc_id long, title string, body string",
    )
    ix = FullTextIndex.build(spark, docs, schema, id_col="doc_id",
                             name="fes")
    r = ix.search_json({"query": {"raw": "title:*"}, "limit": 10})
    assert [d.doc["body"] for d in r.docs] == ["common body"]
    # bare unfielded * still matches everything
    r2 = ix.search_json({"query": {"raw": "*"}, "limit": 10})
    assert r2.hits == 2
    # negated field-exists: docs WITHOUT a title
    r3 = ix.search_json({"query": {"raw": "* -title:*"}, "limit": 10})
    assert [d.doc["body"] for d in r3.docs] == ["common body only"]
