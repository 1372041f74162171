"""spark-submit entry point.

    python tools/build_zip.py                        # -> dist/gogstash_spark.zip
    spark-submit --py-files dist/gogstash_spark.zip \
        spark_submit_main.py --spec pipeline.json \
        --input /data/transcripts --out /data/out [--resume]

On a real cluster the input/output paths are Iceberg/S3/HDFS URIs; the
runner's ledger + atomic commits give at-least-once sink writes with
skip-on-resume (exactly-once per sink directory).
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--spec", required=True, help="pipeline spec JSON/YAML path")
    p.add_argument("--input", default=None, help="override spec.input.path")
    p.add_argument("--out", required=True, help="output directory for sinks")
    p.add_argument("--base-dir", default=".", help="base dir for relative lookup paths")
    p.add_argument("--partitions", type=int, default=None)
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--streaming", action="store_true")
    args = p.parse_args(argv)

    from gogstash_spark.plans.spec import PipelineSpec
    from gogstash_spark.runner import run_pipeline

    spark = SparkSession.builder.getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spec = PipelineSpec.load(args.spec)
    if args.input:
        spec.input["path"] = args.input

    if args.streaming:
        from gogstash_spark.streaming.pipeline import run_pipeline_streaming

        run_pipeline_streaming(
            spark, spec, spec.input["path"], args.out, base_dir=args.base_dir
        )
        return 0

    res = run_pipeline(
        spark,
        spec,
        out_dir=args.out,
        base_dir=args.base_dir,
        n_partitions=args.partitions,
        resume=not args.no_resume,
    )
    print(
        json.dumps(
            {
                "sink_rows": res.sink_rows,
                "agg_rows": res.agg_rows,
                "skipped_sinks": res.skipped_sinks,
                "metrics": res.metrics,
                "wall_sec": round(res.wall_sec, 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
