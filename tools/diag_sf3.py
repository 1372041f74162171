"""Diagnostic: which stage of the sf3 e2e flattens the 8->32 scaling?

Decomposes the pipeline wall at local[8] vs local[32] into:
- compute: scan -> grok -> enrich -> routes -> explode -> rebalance,
  written to a NOOP sink (no parquet write, no read-back)
- e2e: the full run_pipeline partitioned write (adds the parquet write,
  the lineage read-back and the aggregate)

If compute scales near the machine ceiling but e2e does not, the
difference is the disk-bound write/read-back fraction.
"""
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SNIPPET = """
import json, shutil, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from gogstash_spark.session import get_spark
from gogstash_spark.pipelines import standard_spec
from gogstash_spark.plans.compile import compile_pipeline, ROUTES
from gogstash_spark.operators import Context
from gogstash_spark.runner import run_pipeline, _fanout_distribute
from gogstash_spark.sources.transcripts import ensure_transcripts
spark = get_spark(app_name="diag", master="local[{cores}]")
data_dir = ensure_transcripts({sf_dir!r})
spec = standard_spec(data_dir)
plan = compile_pipeline(spec, Context(spark=spark, base_dir=data_dir))

def compute_only():
    routed = plan.run(spark.read.parquet(data_dir + "/transcripts"))
    exploded = routed.select(F.explode(ROUTES).alias("route"), "*").drop(ROUTES)
    exploded = _fanout_distribute(exploded, 32, size_by_data=True)
    exploded.write.mode("overwrite").format("noop").save()

def e2e():
    shutil.rmtree("/tmp/diag_out_{cores}", ignore_errors=True)
    run_pipeline(spark, spec, out_dir="/tmp/diag_out_{cores}",
                 base_dir=data_dir, resume=False, write_mode="partitioned")

out = {{}}
for name, fn in (("compute", compute_only), ("e2e", e2e)):
    fn()  # warm-up
    best = 1e9
    for _ in range(2):
        t0 = time.time(); fn(); best = min(best, time.time() - t0)
    out[name] = round(best, 2)
shutil.rmtree("/tmp/diag_out_{cores}", ignore_errors=True)
print("RESULT " + json.dumps(out))
"""


def run(cores: int, sf_dir: str) -> dict:
    code = SNIPPET.format(repo=REPO, cores=cores, sf_dir=sf_dir)
    p = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=3600)
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(p.stderr[-2000:])


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf3"
    res = {}
    # interleave configs so host drift hits both
    for rnd in range(2):
        for cores in (8, 32):
            r = run(cores, sf_dir)
            if cores in res:
                for k, v in r.items():
                    res[cores][k] = min(res[cores][k], v)
            else:
                res[cores] = r
    rep = {
        "sf_dir": sf_dir,
        "local8": res[8],
        "local32": res[32],
        "compute_speedup": round(res[8]["compute"] / res[32]["compute"], 3),
        "e2e_speedup": round(res[8]["e2e"] / res[32]["e2e"], 3),
        "write_fraction_32": round(
            (res[32]["e2e"] - res[32]["compute"]) / res[32]["e2e"], 3),
    }
    print(json.dumps(rep, indent=1))


if __name__ == "__main__":
    main()
