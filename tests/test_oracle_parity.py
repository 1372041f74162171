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


def test_every_query_is_in_the_latest_correctness_artifact(contract):
    """Round-4 lesson: the driver's CORRECTNESS_r*.json holds at most 50
    rows — with 51 exposed queries the last dict entry (then
    multimodal_decode) silently fell out of the check for a round.
    Guard both halves: the query dict must never exceed the cap, and
    every exposed query must have a row in the newest artifact (new
    queries added since the last driver run go in NEW_QUERIES, an
    explicit list that must be emptied once their rows land)."""
    import glob
    import json
    import re

    NEW_QUERIES: set[str] = set()  # nothing new-and-unchecked right now

    qs, _ = contract
    assert len(qs) <= 50, (
        "driver correctness artifact caps at 50 rows; %d queries exposed "
        "— merge or retire one (see README 'Correctness gate')" % len(qs)
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest, latest_n = None, -1
    for p in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        if m and int(m.group(1)) > latest_n:
            latest, latest_n = p, int(m.group(1))
    if latest is None:
        pytest.skip("no CORRECTNESS_r*.json yet (round 1)")
    with open(latest) as f:
        checked = set(json.load(f))
    unchecked = sorted(set(qs) - checked - NEW_QUERIES)
    assert unchecked == [], (
        "queries with no row in %s (and not declared NEW_QUERIES): %s"
        % (os.path.basename(latest), unchecked)
    )
    stale_new = sorted(NEW_QUERIES & checked)
    assert stale_new == [], (
        "NEW_QUERIES entries already checked in %s — remove them: %s"
        % (os.path.basename(latest), stale_new)
    )


def test_every_query_has_oracle_or_is_flagged(contract):
    qs, oracles = contract
    missing = sorted(set(qs) - set(oracles))
    # non-SQL-expressible ops may be rows-only; keep the list EXPLICIT
    # so a query can't silently drop out of the hash gate. Round 5:
    # empty — even the Lloyd-trained IVF has a full hash oracle (the
    # fixed iteration count unrolls as chained CTEs).
    assert missing == [], "queries without oracle: %s" % missing
