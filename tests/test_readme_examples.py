"""The reference README's example queries, verbatim, through the API.

Bodies copied exactly from /root/reference/README.md:163-187 and run
against the 5-doc fixture index (the index those examples target).
"""

import json

import pytest

from toshi_spark.api import ToshiApi
from toshi_spark.index.catalog import IndexCatalog
from toshi_spark.fixtures import TOSHI_FIXTURE_ROWS
from toshi_spark.schema import TOSHI_FIXTURE_SCHEMA_SPECS

EXAMPLES = [
    # (README body, expected hits on the fixture)
    ('{ "query": {"term": {"test_text": "document" } }, "limit": 10 }', 3),
    ('{ "query": {"fuzzy": {"test_text": {"value": "document", '
     '"distance": 0, "transposition": false } } }, "limit": 10 }', 3),
    ('{ "query": {"phrase": {"test_text": {"terms": ["test","document"] } } },'
     ' "limit": 10 }', 3),
    ('{ "query": {"range": { "test_i64": { "gte": 2012, "lte": 2015 } } }, '
     '"limit": 10 }', 1),
    ('{ "query": {"regex": { "test_text": "d[ou]{1}c[k]?ument" } }, '
     '"limit": 10 }', 4),
    ('{ "query": {"bool": {"must": [ { "term": { "test_text": "document" } } ]'
     ', "must_not": [ {"range": {"test_i64": { "gt": 2017 } } } ] } }, '
     '"limit": 10 }', 2),
]


@pytest.fixture(scope="module")
def api(spark, tmp_path_factory):
    cat = IndexCatalog(spark, str(tmp_path_factory.mktemp("readme_cat")))
    a = ToshiApi(cat)
    a.handle("PUT", "/test_index/_create",
             [vars(s) for s in TOSHI_FIXTURE_SCHEMA_SPECS.fields])
    nd = "\n".join(
        json.dumps(dict(zip(
            ["test_text", "test_i64", "test_u64", "test_unindex",
             "test_facet"], row)))
        for row in TOSHI_FIXTURE_ROWS
    )
    a.handle("POST", "/test_index/_bulk", nd)
    a.handle("GET", "/test_index/_flush")
    return a


@pytest.mark.parametrize("body,expected", EXAMPLES,
                         ids=["term", "fuzzy", "phrase", "range", "regex",
                              "bool"])
def test_readme_example(api, body, expected):
    code, resp = api.handle("POST", "/test_index", json.loads(body))
    assert code == 200
    assert resp["hits"] == expected
