"""Benchmark harness.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": <sec>, "unit": "sec",
"queries": {name: sec}, "sf": <sf>, "turns_per_sec": ...}.

The headline is the full parse -> enrich -> route -> fan-out -> aggregate
batch (run_pipeline writing real sinks), i.e. the north-rule metric
turns/sec; per-operator queries are timed as count() actions.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from gogstash_spark.pipelines import standard_spec
    from gogstash_spark.runner import run_pipeline
    from gogstash_spark.session import get_spark
    from gogstash_spark.sources.transcripts import ensure_transcripts, sf_of_dir

    spark = get_spark(app_name="gogstash_spark_bench", master="local[%s]" % cpus)
    data_dir = ensure_transcripts(sf_dir)
    sf = sf_of_dir(sf_dir)

    import __spark_entry__ as entry

    qs = entry.queries()
    timings: dict[str, float] = {}

    # headline: end-to-end pipeline with real sink writes.
    # One warm-up run first: JVM codegen + Python worker pool spin-up are
    # per-process costs that a 100 TB job amortizes to zero; the metric
    # is steady-state turns/sec.
    out_dir = "/tmp/gogstash_bench_out"
    spec = standard_spec(data_dir)
    shutil.rmtree(out_dir, ignore_errors=True)
    run_pipeline(spark, spec, out_dir=out_dir, base_dir=data_dir, resume=False, write_mode="partitioned")
    # three measured runs, keep the min: the sandbox host is shared and a
    # single run can be 2x off (see BASELINE.md noise notes)
    e2e = float("inf")
    for _ in range(3):
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.time()
        res = run_pipeline(
            spark, spec, out_dir=out_dir, base_dir=data_dir, resume=False,
            write_mode="partitioned",
        )
        e2e = min(e2e, time.time() - t0)
    timings["pipeline_e2e_write"] = round(e2e, 3)
    n_turns = res.metrics.get("pipeline", {}).get("rows_total", 0)

    for name in [
        "grok_parse",
        "kv_parse",
        "json_parse",
        "lookup_enrich",
        "cond_route",
        "agg_report",
        "dedup_exact",
        "dedup_minhash_lsh",
        "ann_topk_lsh",
        "text_quality",
        "token_count",
        "sessionize",
        "syslog_parse",
    ]:
        if name not in qs:
            continue
        # noop sink forces full column computation (count() would let
        # Catalyst prune the parse away); min of two runs vs host noise
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "parse_enrich_route_aggregate_bench",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "turns": int(n_turns),
                "turns_per_sec": round(n_turns / e2e, 1) if e2e > 0 else None,
                "cpus": cpus,
                "sink_rows": res.sink_rows,
            }
        )
    )


if __name__ == "__main__":
    main()
