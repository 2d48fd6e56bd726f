#!/usr/bin/env python
"""Six-run §9aa band recording: run bench.py N times (fresh process
each — the §9aa protocol), harvest each run's raw total, probe median,
and the per-metric normalized values from BENCH_LOCAL.json, and print
the band block ready to paste into bench.py's COMMITTED_NORMALIZED and
SURVEY §9aa.

Run whenever the HEADLINE set changes (headline_hash invalidates the
previous recording). Takes ~30-40 min at sf0.1.

GATING RULE (VERDICT r13 item 3 — both probe directions): bench.py's
`within_band` / `metric_vs_band` verdicts divide by the live probe
median CLAMPED to this recording's `probe_median_range`. Rationale:
probe-normalization exists to cancel SUSTAINED host-speed offsets
between the recording host and the live host; when the live 3-sample
probe median falls outside the range every recording run produced, the
probe itself is the outlier and dividing by it injects probe noise
into the gate — r13's driver probe (0.52) undercut the recorded floor
(0.532) and inflated every normalized metric ~8% on a flat-raw run
(`within_band: false` with raw mid-band). Clamping to the nearest
recorded bound is conservative against probe NOISE in both directions:
a noisy too-fast probe cannot inflate the gate (fast-host false
alarm), a noisy too-slow probe cannot mask a regression (slow-host
false pass). Known blind spot (ADVICE r14): on a host with a SUSTAINED
genuine speedup — the probe truly below the recorded floor — the
clamp deflates the gated total by probe/floor, so a real regression up
to that offset can pass the one-sided gate; bench.py's unclamped
`raw_total_band` report is the backstop for that case. The as-measured
normalization is still emitted separately (banded_normalized) so
future recordings stay comparable. The headline gate is ONE-SIDED:
`within_band` is true iff the gated total is at or below the recorded
ceiling — a run faster than every recording run is not a regression
(r14's confirmation run landed below the floor on an in-range probe);
`headline_vs_band` reports the direction for readers who want it.

Usage: python scripts/record_band.py [n_runs]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
METRICS = [
    "vector_ann_ivfpq_topk",
    "text_prefix_filter_join",
    "dedup_simhash_pairs",
    "graph_family_total",
    # r14 (VERDICT r13 item 4): banded after its unexplained 3.10→4.65s
    # r13 move — the only >3s query without a committed per-query band
    "dedup_cluster_exact",
]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    runs = []
    for i in range(n):
        subprocess.run(
            [sys.executable, os.path.join(HERE, "bench.py")],
            capture_output=True,
            check=True,
            cwd=HERE,
        )
        with open(os.path.join(HERE, "BENCH_LOCAL.json")) as fh:
            d = json.load(fh)
        # Archive the full per-run record (per-query timings included)
        # so post-recording studies (e.g. the §20h 32x slopes) can read
        # every run instead of only the last surviving BENCH_LOCAL.
        arch = os.path.join("/tmp", "band_runs")
        os.makedirs(arch, exist_ok=True)
        with open(os.path.join(arch, f"run{i}.json"), "w") as fh:
            json.dump(d, fh)
        probe = statistics.median(d["noise_probe"])
        run = {
            "raw": d["value"],
            "probe": probe,
            "normalized": round(d["value"] / probe, 1),
            "hash": d["bench_config"]["headline_hash"],
        }
        for m in METRICS:
            run[m] = d["banded_normalized"].get(m)
        runs.append(run)
        print(json.dumps(run), flush=True)

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
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
