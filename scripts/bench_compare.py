"""Session-normalized bench regression tracker (VERDICT r3 #9) —
automates what BENCH/BASELINE.md does by hand.

Host wall-clock drifts ±50-60% across process starts on this box, so a
raw lap-to-lap comparison can't tell a regression from a slow VM
session. This script runs (a) the pure-compute calibration probe
(scaling_bench.py's shuffle-free xxhash64 reduction — measures ONLY
how fast the host is right now) and (b) the full bench.py lap in the
same session, then compares each query's PROBE-NORMALIZED time
(query_s / probe_s — host-speed-independent units) against the best
prior normalized time in the history file.

Usage:  python scripts/bench_compare.py [--history BENCH/bench_history.jsonl]
                                        [--laps N]
Env:    the same knobs bench.py reads (SPARK_GRAFT_CPUS, BENCH_TURNS,
        BENCH_ONLY, SPARK_GRAFT_SF_DIR).

``--laps`` (default 2) runs the whole bench.py process N times and
keeps each query's MINIMUM — the flagship does its own in-process
best-of-laps, but the small (<5 s) headline queries run once per
process and a single GC pause reads as a fake 50-80% regression;
process-level best-of-N is what this tracker compares and stores.

Writes:
  * appends one {"ts", "cpus", "probe_wall_s", "lap": <bench json>}
    record to the history file;
  * BENCH/bench_compare_latest.json with per-query normalized values,
    deltas vs the best prior record, and a one-line verdict each:
      faster   < 0.90× best prior normalized
      ok       ≤ 1.15×  (noise band)
      slower   ≤ 1.50×
      REGRESSED > 1.50×
    (first run: verdict "baseline").
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def probe(n_cpus: int) -> float:
    """Best-of-3 wall for the shuffle-free pure-compute reduction —
    identical shape to scaling_bench.calibration (one number that
    moves with host speed and nothing else)."""
    from pyspark.sql import SparkSession, functions as F
    spark = (SparkSession.builder.master(f"local[{n_cpus}]")
             .appName("bench-probe")
             .config("spark.sql.shuffle.partitions", str(n_cpus))
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.range(0, 400_000_000, 1, 128)
    expr = F.xxhash64(F.concat(F.col("id").cast("string"), F.lit("x")))
    spark.range(0, 1_000_000, 1, n_cpus).select(F.max(expr)).collect()
    laps = []
    for _ in range(3):
        t0 = time.time()
        df.select(F.max(expr).alias("s")).collect()
        laps.append(time.time() - t0)
    spark.stop()
    return round(min(laps), 3)


def run_bench() -> dict:
    out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                         env=dict(os.environ), capture_output=True,
                         text=True, timeout=3600)
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise SystemExit("bench.py failed")
    return parse_lap_stdout(out.stdout)


def parse_lap_stdout(stdout: str) -> dict:
    """Extract the bench lap dict from bench.py stdout. Spark/JVM
    chatter can land on stdout after the JSON line — scan from the end
    for the first parseable lap instead of assuming the last line is
    it, and fail with the offending tail, not a bare
    JSONDecodeError/KeyError."""
    lines = [ln for ln in stdout.strip().splitlines() if ln.strip()]
    for ln in reversed(lines):
        try:
            lap = json.loads(ln)
        except json.JSONDecodeError:
            continue
        if isinstance(lap, dict) and isinstance(lap.get("queries"), dict):
            return lap
        got = (sorted(lap)[:10] if isinstance(lap, dict)
               else type(lap).__name__)
        raise SystemExit("bench.py emitted JSON without a 'queries' "
                         f"dict — got {got}")
    raise SystemExit("no JSON lap line found in bench.py stdout; tail:\n"
                     + "\n".join(lines[-5:]))


def verdict(ratio: float) -> str:
    if ratio < 0.90:
        return "faster"
    if ratio <= 1.15:
        return "ok"
    if ratio <= 1.50:
        return "slower"
    return "REGRESSED"


def main():
    hist_path = os.path.join(REPO, "BENCH", "bench_history.jsonl")
    if "--history" in sys.argv:
        hist_path = sys.argv[sys.argv.index("--history") + 1]
    n_laps = (int(sys.argv[sys.argv.index("--laps") + 1])
              if "--laps" in sys.argv else 2)

    p = probe(CPUS)
    lap = run_bench()
    for _ in range(n_laps - 1):
        nxt = run_bench()
        for q, s in nxt.get("queries", {}).items():
            if s < lap["queries"].get(q, float("inf")):
                lap["queries"][q] = s
        lap["value"] = round(sum(lap["queries"].values()), 3)
    record = {"ts": datetime.now(timezone.utc).isoformat(
                  timespec="seconds"),
              "cpus": CPUS, "probe_wall_s": p, "lap": lap}

    prior: list[dict] = []
    if os.path.exists(hist_path):
        with open(hist_path) as f:
            prior = [json.loads(ln) for ln in f if ln.strip()]
    # comparable prior records: same cpu count, same sf, overlapping
    # query set (BENCH_ONLY runs compare only within themselves)
    prior = [r for r in prior
             if r.get("cpus") == CPUS
             and r.get("lap", {}).get("sf") == lap.get("sf")]

    best_norm: dict[str, float] = {}
    for r in prior:
        pw = r.get("probe_wall_s") or 1.0
        for q, s in r.get("lap", {}).get("queries", {}).items():
            n = s / pw
            if q not in best_norm or n < best_norm[q]:
                best_norm[q] = n

    report = {"ts": record["ts"], "cpus": CPUS, "probe_wall_s": p,
              "sf": lap.get("sf"), "n_prior_records": len(prior),
              "queries": {}}
    lines = []
    for q, s in sorted(lap.get("queries", {}).items()):
        norm = round(s / p, 4)
        entry = {"wall_s": s, "normalized": norm}
        if q in best_norm:
            ratio = norm / best_norm[q]
            entry.update({"best_prior_normalized": round(best_norm[q], 4),
                          "ratio_vs_best": round(ratio, 3),
                          "verdict": verdict(ratio)})
        else:
            entry["verdict"] = "baseline"
        report["queries"][q] = entry
        lines.append(f"{entry['verdict']:>9}  {q}: {s:.2f}s "
                     f"(norm {norm:.3f}"
                     + (f", {entry['ratio_vs_best']:.2f}x best prior"
                        if "ratio_vs_best" in entry else "")
                     + ")")

    os.makedirs(os.path.dirname(hist_path), exist_ok=True)
    with open(hist_path, "a") as f:
        f.write(json.dumps(record) + "\n")
    with open(os.path.join(REPO, "BENCH", "bench_compare_latest.json"),
              "w") as f:
        json.dump(report, f, indent=2)
    print("\n".join(lines))
    worst = [q for q, e in report["queries"].items()
             if e["verdict"] == "REGRESSED"]
    print(json.dumps({"probe_wall_s": p, "regressed": worst,
                      "history": hist_path}))


if __name__ == "__main__":
    main()
