"""Damerau fuzzy compilation paths (round 7).

distance=1 compiles to pure JVM column algebra (lev ≤ 1 OR literal
adjacent-swap set — no Python worker in the plan); distance=2 keeps
the Arrow UDF but only over the d < lev ≤ 2d shell.  Both must agree
exactly with a brute-force Damerau oracle over the term dictionary.
"""

import pytest
from pyspark.sql import Row

from toshi_spark.engine import FullTextIndex
from toshi_spark.query.compiler import _damerau
from toshi_spark.query.dsl import parse_search
from toshi_spark.schema import FieldSpec, IndexSchema

# one term per doc → matched doc ids ARE the matched dictionary terms
VOCAB = [
    "spark", "sprak", "spakr", "psark", "sparkk", "spak", "sparc",
    "saprk", "spork", "shark", "stark", "sparks", "park", "aspark",
    "sprka", "rapks", "kraps", "spray", "scark", "spa",
]


@pytest.fixture(scope="module")
def ix(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(VOCAB)])
    schema = IndexSchema(
        [FieldSpec("text", "text", stored=False, indexed=True)])
    return FullTextIndex.build(spark, docs, schema, id_col="doc_id",
                               name="dampin", cache=False)


def _matched_terms(ix, dist):
    df = ix.search_df(parse_search({
        "query": {"fuzzy": {"text": {"value": "spark", "distance": dist,
                                     "transposition": True}}},
        "limit": 100,
    }))
    return {VOCAB[r["doc_id"]] for r in df.collect()}, df


@pytest.mark.parametrize("dist", [1, 2])
def test_damerau_matches_bruteforce(ix, dist):
    want = {t for t in VOCAB if _damerau(t, "spark", dist) <= dist}
    got, _ = _matched_terms(ix, dist)
    assert got == want, (dist, got ^ want)
    # the transposition case is actually exercised
    assert "sprak" in got


def test_distance1_plan_has_no_python_worker(ix):
    _, df = _matched_terms(ix, 1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for py in ("ArrowEvalPython", "BatchEvalPython", "PythonUDF"):
        assert py not in plan, plan


def test_distance2_keeps_udf_on_shell_only(ix):
    _, df = _matched_terms(ix, 2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan or "PythonUDF" in plan
    # the JVM levenshtein bound prunes BELOW the UDF
    assert "levenshtein" in plan
