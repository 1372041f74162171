"""Property-style randomized tests (seeded corpus, single Spark job):

- kv filter: render k=v lines from random dicts -> parse -> exact map
  round-trip (quote-aware values with spaces)
- cond translator: govaluate expression evaluated by Spark SQL matches
  a pure-Python evaluation over the same random rows
"""

import random

import pytest
from pyspark.sql import functions as F

from gogstash_spark.functions.conds import cond_to_sql
from gogstash_spark.operators import Context, compile_filter

SEED = 1234


class TestKvRoundtrip:
    def test_random_kv_lines_roundtrip(self, spark):
        rng = random.Random(SEED)
        words = ["alpha", "beta", "gamma", "delta", "k9", "x_1"]
        cases = []
        for i in range(60):
            d = {}
            for _ in range(rng.randint(1, 5)):
                k = rng.choice(words)
                if rng.random() < 0.4:
                    v = '"%s %s"' % (rng.choice(words), rng.randint(0, 99))
                else:
                    v = str(rng.randint(0, 9999))
                d[k] = v
            line = " ".join("%s=%s" % (k, v) for k, v in d.items())
            expected = {k: v.strip('"') for k, v in d.items()}
            cases.append((i, line, expected))
        df = spark.createDataFrame(
            [(i, line) for i, line, _ in cases], "id int, text string"
        )
        stage = compile_filter({"type": "kv", "target": "kvm"}, Context(spark=spark))
        got = {r["id"]: dict(r["kvm"]) for r in stage(df).collect()}
        for i, _, expected in cases:
            assert got[i] == expected, (i, got[i], expected)


class TestCondVsPython:
    @pytest.mark.parametrize(
        "expr",
        [
            "a > b && c == 'x'",
            "a + b * 2 >= 10 || c != 'x'",
            "!(a == b) && c IN ('x','y')",
            "empty(d) || strlen(c) > 0",
            "a % 3 == 0 && (b - a) < 5",
        ],
    )
    def test_sql_matches_python(self, spark, expr):
        rng = random.Random(SEED)
        rows = [
            (i, rng.randint(0, 12), rng.randint(0, 12),
             rng.choice(["x", "y", "z"]), rng.choice(["", "v", None]))
            for i in range(200)
        ]
        df = spark.createDataFrame(rows, "id int, a int, b int, c string, d string")
        sql = cond_to_sql(expr)
        got = {
            r["id"]: bool(r["p"])
            for r in df.withColumn("p", F.coalesce(F.expr(sql), F.lit(False))).collect()
        }

        def py_eval(a, b, c, d):
            env = {"a": a, "b": b, "c": c, "d": d}
            e = expr
            e = e.replace("&&", " and ").replace("||", " or ")
            e = e.replace("!(", " not (")
            e = e.replace("empty(d)", "(d is None or d == '')")
            e = e.replace("strlen(c)", "len(c)")
            e = e.replace("c IN ('x','y')", "c in ('x','y')")
            return bool(eval(e, {}, env))  # noqa: S307 test-only oracle

        for i, a, b, c, d in rows:
            assert got[i] == py_eval(a, b, c, d), (i, expr, (a, b, c, d))
