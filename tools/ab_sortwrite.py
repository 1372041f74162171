"""A/B: does extending the fan-out write's per-task sort with
(conv_id, turn_idx) shrink the zstd parquet bytes without costing wall?

Spark's dynamic-partition v1 write already sorts each task's rows by
the partition column (route) so one file is open at a time; a
sortWithinPartitions("route", <keys>) ahead of the write satisfies that
required ordering as a prefix, so the writer adds NO second sort — the
only delta is the wider comparator, and rows of one conversation land
adjacent, which should compress better under zstd on text-heavy data.

Interleaved min-of-N in separate subprocesses (same-window discipline):
baseline → sorted → baseline → sorted. Prints one JSON line.
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SNIPPET = """
import json, os, shutil, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from gogstash_spark.session import get_spark
from gogstash_spark.pipelines import standard_spec
from gogstash_spark import runner
from gogstash_spark.sources.transcripts import ensure_transcripts

mode = {mode!r}
if mode == "sorted":
    _orig = runner._fanout_distribute
    def _sorted(exploded, n_partitions, size_by_data):
        out = _orig(exploded, n_partitions, size_by_data)
        keys = ["route"] + [c for c in ("conv_id", "turn_idx") if c in out.columns]
        return out.sortWithinPartitions(*keys)
    runner._fanout_distribute = _sorted

spark = get_spark(master="local[{cores}]")
data_dir = ensure_transcripts({sf_dir!r})
out_dir = "/tmp/gs_ab_sortwrite"
shutil.rmtree(out_dir, ignore_errors=True)
t0 = time.time()
res = runner.run_pipeline(
    spark, standard_spec(data_dir), out_dir=out_dir, base_dir=data_dir,
    resume=False,
)
wall = time.time() - t0
total = 0
for root, _, fs in os.walk(os.path.join(out_dir, "by_route")):
    for f in fs:
        total += os.path.getsize(os.path.join(root, f))
print(json.dumps({{"mode": mode, "wall": round(wall, 2), "bytes": total,
                   "rows": sum(res.sink_rows.values())}}))
spark.stop()
"""


def run(mode: str, sf_dir: str, cores: int) -> dict:
    code = SNIPPET.format(repo=REPO, mode=mode, sf_dir=sf_dir, cores=cores)
    p = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, cwd=REPO
    )
    line = [l for l in p.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    walls: dict[str, list] = {"baseline": [], "sorted": []}
    by: dict[str, int] = {}
    for _ in range(reps):
        for mode in ("baseline", "sorted"):
            r = run(mode, sf_dir, cores)
            walls[mode].append(r["wall"])
            by[mode] = r["bytes"]
            print("  ", r, file=sys.stderr)
    out = {
        "sf_dir": sf_dir,
        "cores": cores,
        "baseline": {"wall_min": min(walls["baseline"]), "walls": walls["baseline"],
                     "bytes": by["baseline"]},
        "sorted": {"wall_min": min(walls["sorted"]), "walls": walls["sorted"],
                   "bytes": by["sorted"]},
        "bytes_ratio": round(by["sorted"] / by["baseline"], 4),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
