"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry at sf0.01 and compares against its
``oracle_sql()`` in DuckDB: row count, column names, and
order-insensitive value equality (the driver hashes; we compare sorted
tuples directly for better failure messages).
"""

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def normalize(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in cols:
            v = r[c] if not isinstance(r, tuple) else r[cols.index(c)]
            if isinstance(v, float):
                v = round(v, 6)
                if math.isclose(v, round(v), abs_tol=1e-9):
                    v = float(round(v))
            if hasattr(v, "item"):
                v = v.item()
            out_v = v
            vals.append(out_v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


QUERY_NAMES = sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, ddb, name):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    sdf = qs[name](spark, SF_DIR)
    scols = [c.lower() for c in sdf.columns]
    srows = [tuple(r) for r in sdf.collect()]
    if name not in oracles:
        # rows-only contract (non-SQL-expressible op): driver records a
        # weaker check; here we just require a sane non-empty result
        assert len(srows) > 0
        return
    orel = ddb.sql(oracles[name])
    ocols = [c.lower() for c in orel.columns]
    orows = orel.fetchall()
    assert scols == ocols, f"column mismatch: {scols} vs {ocols}"
    a = normalize(srows, scols)
    b = normalize(orows, ocols)
    assert len(a) == len(b), f"row count {len(a)} vs oracle {len(b)}"
    assert a == b


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["doc_id", "score"]
