#!/usr/bin/env python
"""Per-entity window crack-point probe (VERDICT r9 item 5).

The §9r audit classifies the per-entity window family (`window_rolling
_avg`, `join_asof`, SCD2, streaks — all partitioned by ``user_id``) as
"irreducible: AQE cannot split a window partition; a pathological bot
user is a data-quality fact the funnel's upstream quota/dedup gates
cut". That caveat was asserted, never measured. This probe measures it:
plant ONE bot user holding P% of all events (P = 0 / 1 / 10 / 30),
run the two flagship per-entity shapes through the REGISTRY code
against the planted replica, and record where the one-user straggler
starts to dominate wall time — the number that tells a 100x operator
when "irreducible" becomes "the bottleneck" and the upstream gate
stops being optional.

Method: events from $SPARK_GRAFT_SF_DIR (default sf0.1), key-shifted
R-fold replicated (the §9d harness convention: event_id/user_id
shifted per replica, ts jittered so orderings stay non-degenerate;
R = $SPARK_GRAFT_BOT_FACTOR, default 32 — sf0.1's 100k events are too
small for ANY one-user share to out-run a single core, measured flat
0.23-0.56 s at every P unreplicated), then a deterministic
xxhash64(event_id) % 1000 < 10*P draw reassigned to user_id = -1 and
written once per P to /tmp/csb_botskew/p{P}. Queries run unchanged via
the registry (the replica dir satisfies their only table dependency),
best-of-2 warm on one session. Output: one JSON line per (P, query) to
stdout; paste the table into SURVEY §9.

Expected shape (local[N] == N-executor proxy): the bot partition runs
on one core, so wall ~ max(parallel_part, P * total_work); the knee
sits near P = 1/N (~3% at 32 cores) and past it wall grows linearly
in P while every other core idles.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from cognitive_score_bigdata_spark.queries import load_registry  # noqa: E402
from cognitive_score_bigdata_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTOR = int(os.environ.get("SPARK_GRAFT_BOT_FACTOR", "32"))
OUT_ROOT = "/tmp/csb_botskew"
PCTS = [0, 1, 10, 30]  # percent of ALL events held by the one bot user
QUERIES = ["window_rolling_avg", "join_asof"]


def _replicated_events(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    reps = spark.range(FACTOR).select(F.col("id").alias("__r"))
    shift = F.col("__r") * F.lit(100_000_000)
    return (
        ev.crossJoin(reps)
        .select(
            (F.col("event_id") + shift).alias("event_id"),
            (F.col("user_id") + F.col("__r") * F.lit(1_000_000)).alias(
                "user_id"
            ),
            # jitter ts per replica (+__r seconds) so per-user
            # orderings stay non-degenerate
            (
                F.col("ts") + F.expr("make_dt_interval(0, 0, 0, __r)")
            ).alias("ts"),
            *[
                c
                for c in ev.columns
                if c not in ("event_id", "user_id", "ts")
            ],
        )
    )


def build_replica(spark, pct: int) -> str:
    out = f"{OUT_ROOT}/f{FACTOR}_p{pct}"
    path = f"{out}/events.parquet"
    if os.path.exists(path):
        return out
    os.makedirs(out, exist_ok=True)
    ev = _replicated_events(spark)
    bot = F.pmod(F.xxhash64(F.col("event_id")), F.lit(1000)) < (10 * pct)
    ev.withColumn(
        "user_id",
        F.when(bot, F.lit(-1)).otherwise(F.col("user_id")),
    ).write.mode("overwrite").parquet(path)
    return out


def main() -> None:
    registry = load_registry()
    spark = get_spark("csb-botskew")
    spark.sparkContext.setLogLevel("ERROR")
    def materialize(df) -> None:
        # bench.py's round-10 materializer: .count() lets Catalyst
        # prune the Window node out of the timed plan entirely (this
        # probe's first draft measured exactly that: flat 0.2 s at
        # every P because no window ever ran)
        df.write.format("noop").mode("overwrite").save()

    # warm codegen paths once so timings compare window work, not JIT
    materialize(registry[QUERIES[0]].fn(spark, SF_DIR))
    materialize(registry[QUERIES[1]].fn(spark, SF_DIR))
    for pct in PCTS:
        rep = build_replica(spark, pct)
        for name in QUERIES:
            best = None
            n = registry[name].fn(spark, rep).count()
            for _ in range(2):
                spark._jvm.System.gc()  # noqa: SLF001
                t0 = time.perf_counter()
                materialize(registry[name].fn(spark, rep))
                sec = round(time.perf_counter() - t0, 3)
                best = sec if best is None else min(best, sec)
            print(
                json.dumps(
                    {"pct_bot": pct, "query": name, "secs": best, "rows": n}
                ),
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
