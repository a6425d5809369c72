"""Scaling-efficiency evidence (BASELINE.md / north_rule): run the SAME
full-constraint-suite validation job on the SAME parquet input at two
parallelism levels — local[8] (N) and local[32] (4N) — plus a
pure-compute CALIBRATION probe that measures the most this host can
scale at all (single-box VM: a 4× thread increase does not multiply
memory bandwidth, unlike real N→4N executor clusters).

Each level runs in its own subprocess (own JVM) with a JIT warm-up lap
(bench.py) and best-of-N in-process laps.

Usage: python scripts/scaling_bench.py [n_turns] [out_name]
(defaults 8_000_000, scaling_run.json)
Writes BENCH/<out_name>; curate numbers into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cpus: int, n_turns: int) -> dict:
    env = dict(os.environ)
    env.update({
        "SPARK_GRAFT_CPUS": str(cpus),
        "BENCH_TURNS": str(n_turns),
        "BENCH_ONLY": "validate_transcripts",
        "BENCH_LAPS": os.environ.get("BENCH_LAPS", "3"),
    })
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600)
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise SystemExit("bench.py failed")
    # same robust lap extraction as bench_compare (JVM chatter can
    # trail the JSON line on stdout)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench_compare import parse_lap_stdout
    return parse_lap_stdout(out.stdout)


def calibration(n: int) -> float:
    """Best-of-3 wall for a perfectly parallel shuffle-free probe at
    local[n] — the host's scaling ceiling reference."""
    from pyspark.sql import SparkSession, functions as F
    spark = (SparkSession.builder.master(f"local[{n}]")
             .appName(f"calib{n}")
             .config("spark.sql.shuffle.partitions", str(n))
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.range(0, 400_000_000, 1, 128)
    expr = F.xxhash64(F.concat(F.col("id").cast("string"), F.lit("x")))
    spark.range(0, 1_000_000, 1, n).select(F.max(expr)).collect()
    laps = []
    for _ in range(3):
        t0 = time.time()
        df.select(F.max(expr).alias("s")).collect()
        laps.append(time.time() - t0)
    spark.stop()
    return round(min(laps), 2)


def main():
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    out_name = sys.argv[2] if len(sys.argv) > 2 else "scaling_run.json"
    # N and 4N parallelism levels (default 8→32). local[2]→local[8]
    # measures the UNSTARVED regime on this single box: 32 threads
    # share one memory subsystem (the pure-compute probe itself only
    # scales ~0.6-0.7 at 8→32), whereas on a real N→4N executor
    # cluster each added executor brings its own memory bandwidth —
    # the low pair is the closer analog of that.
    lo = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    hi = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    if hi != 4 * lo:
        raise SystemExit("levels must be N and 4N")
    r8 = run_level(lo, n_turns)
    r32 = run_level(hi, n_turns)
    c8, c32 = calibration(lo), calibration(hi)
    tp8 = r8["validated_turns_per_sec"]
    tp32 = r32["validated_turns_per_sec"]
    eff = round((tp32 / tp8) / 4.0, 3)
    ceiling = round((c8 / c32) / 4.0, 3)
    result = {
        "n_turns": n_turns,
        f"turns_per_sec_local{lo}": tp8,
        f"turns_per_sec_local{hi}": tp32,
        f"wall_s_local{lo}": r8["queries"]["validate_transcripts"],
        f"wall_s_local{hi}": r32["queries"]["validate_transcripts"],
        "scaling_efficiency_raw": eff,
        "host_pure_compute_ceiling": ceiling,
        "scaling_efficiency_relative_to_ceiling":
            round(eff / ceiling, 3) if ceiling else None,
        "calibration_wall_s": {f"local{lo}": c8, f"local{hi}": c32},
        "target": 0.8,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", out_name), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
