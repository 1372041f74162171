"""Two-cluster-size scaling evidence (sandbox proxy for N vs 4N executors).

Runs the identical end-to-end pipeline job at local[8] and local[32]
over the same input (separate JVMs via subprocess), reports throughput
at both and scaling efficiency = (T8/T32)/4 relative to the 4x core
ratio, and appends the measured table to BASELINE.md (## Measured).

Usage: python bench_scaling.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

RUNNER = """
import json, shutil, sys, time
sys.path.insert(0, {repo!r})
from gogstash_spark.session import get_spark
from gogstash_spark.pipelines import standard_spec
from gogstash_spark.runner import run_pipeline
from gogstash_spark.sources.transcripts import ensure_transcripts
spark = get_spark(app_name="scaling", master="local[{cores}]")
data_dir = ensure_transcripts({sf_dir!r})
out = "/tmp/gogstash_scaling_{cores}"
shutil.rmtree(out, ignore_errors=True)
# warm-up: JVM/codegen/Python workers (excluded from the measurement)
run_pipeline(spark, standard_spec(data_dir), out_dir=out, base_dir=data_dir, resume=False)
shutil.rmtree(out, ignore_errors=True)
t0 = time.time()
res = run_pipeline(spark, standard_spec(data_dir), out_dir=out, base_dir=data_dir, resume=False)
wall = time.time() - t0
rows = res.metrics["pipeline"]["rows_total"]
print("RESULT " + json.dumps({{"cores": {cores}, "wall_sec": round(wall,2),
  "rows": int(rows), "turns_per_sec": round(rows/wall,1)}}))
"""


def run_at(cores: int, sf_dir: str, repo: str) -> dict:
    code = RUNNER.format(cores=cores, sf_dir=sf_dir, repo=repo)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=3600
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError("no RESULT line; stderr tail: %s" % out.stderr[-2000:])


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repo = os.path.dirname(os.path.abspath(__file__))
    r8 = run_at(8, sf_dir, repo)
    r32 = run_at(32, sf_dir, repo)
    speedup = r8["wall_sec"] / r32["wall_sec"]
    efficiency = speedup / (32 / 8)
    report = {
        "sf_dir": sf_dir,
        "local8": r8,
        "local32": r32,
        "speedup_8_to_32": round(speedup, 3),
        "scaling_efficiency": round(efficiency, 3),
    }
    print(json.dumps(report))
    with open(os.path.join(repo, "BENCH_SCALING.json"), "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
