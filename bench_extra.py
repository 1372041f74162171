"""Round-6 optimization harness (bench.py is frozen for measurement).

Times individual queries in isolation with the noop sink (guide §1.4),
labels jobs (§1.5), and optionally dumps .explain("formatted") per query
to plans/r06/. Usage:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py \
        [--queries a,b,c] [--reps 2] [--plans before|after]

Prints one JSON line {"queries": {name: best_sec}, "sf_dir": ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=None)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--plans", default=None, help="suffix: dump plans/r06/<q>_<suffix>.txt")
    ap.add_argument("--e2e", action="store_true", help="also time the pipeline e2e write")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from gogstash_spark.session import get_spark
    from gogstash_spark.sources.transcripts import ensure_transcripts

    spark = get_spark(app_name="gogstash_spark_bench_extra", master="local[%s]" % cpus)
    data_dir = ensure_transcripts(sf_dir)

    import bench
    import __spark_entry__ as entry

    qs = entry.queries()
    qs.update(bench._bench_extras())

    names = list(qs) if args.queries is None else args.queries.split(",")
    timings: dict[str, float] = {}
    repo = os.path.dirname(os.path.abspath(__file__))

    spark.range(0, 1000).count()  # session warm-up

    for name in names:
        if name not in qs:
            print("skip unknown query: %s" % name, file=sys.stderr)
            continue
        if args.plans:
            df = qs[name](spark, sf_dir)
            os.makedirs(os.path.join(repo, "plans", "r06"), exist_ok=True)
            with open(
                os.path.join(repo, "plans", "r06", "%s_%s.txt" % (name, args.plans)), "w"
            ) as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted")))
        best = float("inf")
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription("%s rep%d" % (name, rep))
            t0 = time.time()
            qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
            best = min(best, time.time() - t0)
            spark.sparkContext.setJobDescription(None)
        timings[name] = round(best, 3)
        print("%-24s %8.3f" % (name, best), file=sys.stderr)

    if args.e2e:
        import shutil

        from gogstash_spark.pipelines import standard_spec
        from gogstash_spark.runner import run_pipeline

        out_dir = "/tmp/gogstash_bench_extra_out"
        spec = standard_spec(data_dir)
        best = float("inf")
        for rep in range(max(args.reps, 2)):
            shutil.rmtree(out_dir, ignore_errors=True)
            spark.sparkContext.setJobDescription("pipeline_e2e_write rep%d" % rep)
            t0 = time.time()
            run_pipeline(spark, spec, out_dir=out_dir, base_dir=data_dir,
                         resume=False, write_mode="partitioned")
            best = min(best, time.time() - t0)
            spark.sparkContext.setJobDescription(None)
        timings["pipeline_e2e_write"] = round(best, 3)
        print("%-24s %8.3f" % ("pipeline_e2e_write", best), file=sys.stderr)
        shutil.rmtree(out_dir, ignore_errors=True)

    print(json.dumps({"queries": timings, "sf_dir": sf_dir, "cpus": cpus}))


if __name__ == "__main__":
    main()
