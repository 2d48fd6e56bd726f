#!/usr/bin/env python
"""Driver-equivalent oracle verification for a list of queries at one or
more SFs — the behavior-preservation gate run after every optimization
batch this round.

    python scripts/opt_verify.py [--sf DIR ...] query1 query2 ...

For each (sf, query): Spark result vs DuckDB oracle under the SAME
comparator pytest/the driver use (tests.conftest.assert_frames_match).
Queries without an oracle get a rows>0 smoke check. Exit 1 on any
mismatch.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from cognitive_score_bigdata_spark.io import TESTDATA_TABLES  # noqa: E402
from cognitive_score_bigdata_spark.queries import load_registry  # noqa: E402
from cognitive_score_bigdata_spark.session import get_spark  # noqa: E402
from tests.conftest import assert_frames_match  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument(
        "--sf",
        action="append",
        default=None,
        help="testdata dir(s); default sf0.001 AND sf0.01",
    )
    args = ap.parse_args()
    sfs = args.sf or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

    registry = load_registry()
    spark = get_spark("opt-verify", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    failures = 0
    for sf_dir in sfs:
        con = duckdb.connect()
        for t in TESTDATA_TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{os.path.join(sf_dir, t + '.parquet')}')"
            )
        for name in args.names:
            spec = registry.get(name)
            if spec is None:
                print(f"{sf_dir} {name}: NOT REGISTERED", flush=True)
                failures += 1
                continue
            try:
                sp = spec.fn(spark, sf_dir).toPandas()
                if spec.oracle is None:
                    assert len(sp) > 0, "rows-only check: 0 rows"
                    print(f"{sf_dir} {name}: ROWS-ONLY OK ({len(sp)})",
                          flush=True)
                    continue
                oc = con.execute(spec.oracle).df()
                assert_frames_match(sp, oc, name)
                print(f"{sf_dir} {name}: GREEN ({len(sp)} rows)", flush=True)
            except Exception as exc:
                print(f"{sf_dir} {name}: RED — {exc}", flush=True)
                failures += 1
        con.close()
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
