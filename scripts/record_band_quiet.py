#!/usr/bin/env python
"""Steal-gated wrapper around the §9aa band recording: before each of
the N bench runs, wait for a quiet hypervisor window (measured steal %
over a probe interval below a threshold), so the recording is not
wave-contaminated like the three r16 attempts. Runs that STILL catch a
wave mid-run (per-run steal_pct above the threshold) are re-run up to
`max_retries` times; every run (kept and discarded) is archived under
/tmp/band_runs_quiet with its steal markers, so the recording
provenance is auditable.

Usage: python scripts/record_band_quiet.py [n_runs] [steal_gate_pct]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from scripts.record_band import METRICS  # noqa: E402


def steal_pct(interval: float = 20.0) -> float:
    def sample():
        with open("/proc/stat") as fh:
            vals = [int(x) for x in fh.readline().split()[1:9]]
        return sum(vals), vals[7]
    t0, s0 = sample()
    time.sleep(interval)
    t1, s1 = sample()
    return 100.0 * (s1 - s0) / max(t1 - t0, 1)


def wait_quiet(gate: float, max_wait_s: int = 1200) -> float:
    waited = 0
    while True:
        s = steal_pct()
        print(f"  steal probe: {s:.2f}%", flush=True)
        if s <= gate:
            return s
        waited += 20
        if waited >= max_wait_s:
            print(f"  gave up waiting after {max_wait_s}s; running anyway")
            return s
        time.sleep(20)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    gate = float(sys.argv[2]) if len(sys.argv) > 2 else 0.8
    # In-run contamination threshold: any bench segment above this steal
    # % marks the run dirty. Attempt cap bounds the session; if fewer
    # than n clean runs emerge, the least-dirty attempts top the set up
    # to n (mirrors the r16 no-exclusions honesty — every kept run's
    # steal column is printed).
    dirty_at = 2.0
    max_attempts = int(os.environ.get("BAND_MAX_ATTEMPTS", "12"))
    arch = "/tmp/band_runs_quiet"
    os.makedirs(arch, exist_ok=True)
    clean, dirty = [], []
    attempt = 0
    while len(clean) < n and attempt < max_attempts:
        attempt += 1
        print(f"clean {len(clean)}/{n} (attempt {attempt}/{max_attempts}): "
              "waiting for quiet host", flush=True)
        wait_quiet(gate)
        subprocess.run(
            [sys.executable, os.path.join(HERE, "bench.py")],
            capture_output=True,
            check=True,
            cwd=HERE,
        )
        with open(os.path.join(HERE, "BENCH_LOCAL.json")) as fh:
            d = json.load(fh)
        with open(os.path.join(arch, f"attempt{attempt}.json"), "w") as fh:
            json.dump(d, fh)
        steals = d.get("steal_pct", [])
        probe = statistics.median(d["noise_probe"])
        contaminated = any(s > dirty_at for s in steals if s >= 0)
        run = {
            "raw": d["value"],
            "probe": probe,
            "normalized": round(d["value"] / probe, 1),
            "hash": d["bench_config"]["headline_hash"],
            "steal_pct": steals,
            "attempt": attempt,
            "kept": not contaminated,
        }
        for m in METRICS:
            run[m] = d["banded_normalized"].get(m)
        print(json.dumps(run), flush=True)
        (dirty if contaminated else clean).append(run)
        if contaminated:
            print(f"  steal_pct {steals} over {dirty_at}% — marked dirty",
                  flush=True)

    runs = list(clean)
    if len(runs) < n:
        dirty.sort(key=lambda r: max(s for s in r["steal_pct"] if s >= 0))
        fill = dirty[: n - len(runs)]
        for r in fill:
            r["kept"] = "topped_up_least_dirty"
        runs += fill
        print(f"only {len(clean)} clean runs — topped up with "
              f"{len(fill)} least-dirty attempts", flush=True)
    runs.sort(key=lambda r: r["attempt"])

    norm = [r["normalized"] for r in runs]
    out = {
        "recorded_headline_hash": runs[0]["hash"],
        "headline_total_band": [min(norm), max(norm)],
        "headline_total_values": norm,
        "raw_total_band": [
            min(r["raw"] for r in runs),
            max(r["raw"] for r in runs),
        ],
        "probe_median_range": [
            min(r["probe"] for r in runs),
            max(r["probe"] for r in runs),
        ],
        "metric_bands": {
            m: [
                min(r[m] for r in runs if r[m] is not None),
                max(r[m] for r in runs if r[m] is not None),
            ]
            for m in METRICS
        },
        "steal_per_run": [r["steal_pct"] for r in runs],
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
