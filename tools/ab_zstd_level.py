"""A/B/C: which zstd level should the fan-out parquet write use?

Round-4 decomposition (tools/diag_sf3.py) showed the write+read-back
stage is DISK-BANDWIDTH-bound and core-invariant — on a saturated
disk, spending otherwise-idle CPU on a higher zstd level could shrink
bytes and therefore wall, while a lower level only helps if the write
were actually compression-CPU-bound. Measure, don't guess: interleaved
rounds of level 1 / 3 (parquet-mr default, current behavior) / 9 in
separate subprocesses, min wall per level, plus bytes written.

Usage: python tools/ab_zstd_level.py [sf_dir] [rounds]
Prints one JSON line; levels are set via
spark.hadoop.parquet.compression.codec.zstd.level (parquet-mr's knob).
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SNIPPET = """
import json, os, shutil, sys, time
sys.path.insert(0, {repo!r})
from gogstash_spark import session as S
from gogstash_spark.pipelines import standard_spec
from gogstash_spark import runner
from gogstash_spark.sources.transcripts import ensure_transcripts

# inject the level into the session builder's hadoop conf
_orig_get = S.get_spark
def _patched(*a, **kw):
    sp = _orig_get(*a, **kw)
    sp.sparkContext._jsc.hadoopConfiguration().set(
        "parquet.compression.codec.zstd.level", "{level}")
    return sp
S.get_spark = _patched

spark = S.get_spark(master="local[{cores}]")
data_dir = ensure_transcripts({sf_dir!r})
out_dir = "/tmp/gs_ab_zstd"
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
print(json.dumps({{"level": {level}, "wall": round(wall, 2), "bytes": total,
                   "rows": sum(res.sink_rows.values())}}))
spark.stop()
"""


def run(level: int, sf_dir: str, cores: int) -> dict:
    code = SNIPPET.format(repo=REPO, level=level, sf_dir=sf_dir, cores=cores)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=1800
    )
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError("no result; stderr tail: %s" % out.stderr[-1500:])


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    levels = [1, 3, 9]
    walls: dict[int, list[float]] = {lv: [] for lv in levels}
    bytes_: dict[int, int] = {}
    rows: dict[int, int] = {}
    for _ in range(rounds):
        for lv in levels:  # interleaved: every level samples every window
            r = run(lv, sf_dir, 32)
            walls[lv].append(r["wall"])
            bytes_[lv] = r["bytes"]
            rows[lv] = r["rows"]
    base = min(walls[3])
    report = {
        "sf_dir": sf_dir,
        "levels": {
            str(lv): {
                "walls": walls[lv],
                "wall_min": min(walls[lv]),
                "bytes": bytes_[lv],
                "vs_level3_wall": round(min(walls[lv]) / base, 3),
                "vs_level3_bytes": round(bytes_[lv] / bytes_[3], 3),
            }
            for lv in levels
        },
        "rows": rows[3],
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
