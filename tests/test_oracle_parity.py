"""Replica of the driver's correctness gate on a fast subset:
Spark query vs DuckDB oracle — row count + schema + order-insensitive
value hash. Full sweep: `python tools/parity.py /root/testdata/sf0.01`.
"""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.parity import TABLES, compare  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

FAST_QUERIES = [
    "kv_parse",
    "json_parse",
    "hash_fields",
    "ratelimit_sample",
    "lookup_enrich",
    "token_count",
    "text_langid",
    "doc_fingerprint",
    "dedup_exact",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            "CREATE VIEW %s AS SELECT * FROM read_parquet('%s/%s.parquet')"
            % (t, SF_DIR, t)
        )
    return con


@pytest.fixture(scope="module")
def contract():
    import __spark_entry__ as e

    return e.queries(), e.oracle_sql()


@pytest.mark.parametrize("name", FAST_QUERIES)
def test_query_matches_oracle(spark, duck, contract, name):
    qs, oracles = contract
    # oracles are pinned to sf0.01 paths for generated data; rewrite for
    # the fast sf0.001 fixture (testdata views already point at sf0.001)
    sql = oracles[name].replace("/root/repo/data/sf0.01", "/root/repo/data/sf0.001")
    r = compare(name, qs[name](spark, SF_DIR), sql, duck)
    assert r["rows_match"], r
    assert r["schema_match"], r
    assert r["hash_match"], r


def test_entry_returns_rows(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"sink", "tool", "time_bucket", "n"}


def test_every_query_has_oracle_or_is_flagged(contract):
    qs, oracles = contract
    missing = sorted(set(qs) - set(oracles))
    # non-SQL-expressible ops may be rows-only; keep the list EXPLICIT
    # so a query can't silently drop out of the hash gate:
    # - ann_topk_ivf_trained: Lloyd training is iterative (driver
    #   rows-only check); the identical serving plan IS hash-checked
    #   via ann_topk_ivf
    assert missing == ["ann_topk_ivf_trained"], (
        "queries without oracle: %s" % missing
    )
