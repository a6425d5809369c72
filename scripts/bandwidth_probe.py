"""Bandwidth-matched scaling calibration: a shuffle-free, perfectly
parallel probe with the SAME memory profile as the validation flagship
(parquet scan -> decompress -> per-cell string work -> tiny aggregate),
run at several local[n] levels on the same cached bench table.

The pure-compute probe in scaling_bench.py (range -> xxhash64 of a
13-char string) measures the host's ALU scaling ceiling; this probe
measures its MEMORY-BANDWIDTH scaling ceiling, which is what actually
binds an optimized scan-heavy validation job on a single box. On a
real N -> 4N executor cluster each added executor brings its own memory
controllers and page cache, so neither wall exists there; in-sandbox,
a validation-job efficiency that matches this probe's efficiency means
the job itself has no scaling defect.

Usage: python scripts/bandwidth_probe.py [n_turns] [levels...]
(defaults: 32_000_000, levels 2 8 32)
Writes BENCH/bandwidth_probe.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession, functions as F

n = {n}
spark = (SparkSession.builder.master(f"local[{{n}}]")
         .appName(f"bwprobe{{n}}")
         .config("spark.driver.memory", "24g")
         .config("spark.sql.shuffle.partitions", str(n))
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
df = spark.read.parquet({tdir!r})
# scan + decompress + string-bandwidth work per cell, one scalar out;
# no shuffle, no skew: the only thing that can limit 4x threads is the
# host memory subsystem.
expr = F.max(F.xxhash64("conv_id").bitwiseXOR(F.xxhash64("text"))
             .bitwiseXOR(F.octet_length("text").cast("long")))
df.select(expr.alias("s")).collect()   # warm page cache + JIT
laps = []
for _ in range(3):
    t0 = time.time()
    df.select(expr.alias("s")).collect()
    laps.append(time.time() - t0)
print(json.dumps({{"n": n, "wall_s": round(min(laps), 2)}}))
spark.stop()
"""


def main() -> None:
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 32_000_000
    levels = [int(a) for a in sys.argv[2:]] or [2, 8, 32]
    cache = os.environ.get("BENCH_CACHE_DIR", "/tmp/spark_graft_bench")
    tdir = os.path.join(cache, f"transcripts_{n_turns}")
    if not os.path.isdir(tdir):
        raise SystemExit(f"{tdir} missing — run bench.py once at "
                         f"BENCH_TURNS={n_turns} to materialize it")
    walls: dict[int, float] = {}
    for n in levels:
        code = CHILD.format(repo=REPO, n=n, tdir=tdir)
        out = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True, timeout=1800)
        r = json.loads(out.stdout.strip().splitlines()[-1])
        walls[r["n"]] = r["wall_s"]
        print(f"local[{n}]: {r['wall_s']}s", flush=True)
    effs = {}
    for lo in levels:
        hi = 4 * lo
        if hi in walls:
            effs[f"{lo}->{hi}"] = round(walls[lo] / walls[hi] / 4.0, 3)
    result = {"n_turns": n_turns,
              "wall_s": {str(k): v for k, v in walls.items()},
              "bandwidth_ceiling_efficiency": effs}
    with open(os.path.join(REPO, "BENCH", "bandwidth_probe.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
