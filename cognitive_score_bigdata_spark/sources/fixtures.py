"""Deterministic CPMS-shaped fixture generation (FIXTURES.md §A).

Reproduces the reference seed-data shapes — including the source quirks
the ETL must handle: stringified Python-list ID arrays in ``users.csv``
(``data/users.csv:1``), the ``hearth_rate`` header typo
(``data/tracking_risks.csv:1``), ISO-8601 timestamps, and orphan child
rows that the integrity filter must drop (``db_loader.py:121-129``).

Pure-Python CSV writing (driver-side): fixtures are deliberately small —
they test ETL *semantics*; scale is tested on the driver testdata.
"""

from __future__ import annotations

import csv
import os
import random
import uuid
from datetime import datetime, timedelta

DIETS = ["Vegetarian", "Keto", "Vegan", "Omnivore", "Paleo"]
RISKS = ["Low", "High", "Critical", "Medium"]


def _uuid(rng: random.Random) -> str:
    return str(uuid.UUID(int=rng.getrandbits(128), version=4))


def _iso_ts(rng: random.Random) -> str:
    base = datetime(2023, 1, 1)
    return (base + timedelta(seconds=rng.randrange(0, 3 * 365 * 86400))).strftime(
        "%Y-%m-%dT%H:%M:%S"
    )


def generate_cpms_csvs(
    out_dir: str,
    n_users: int = 30,
    seed: int = 42,
    n_orphans: int = 3,
) -> dict[str, object]:
    """Write users/cognitive_scores/tracking_risks CSVs; return expected
    post-ETL facts (row counts, orphan ids) for assertions."""
    rng = random.Random(seed)
    os.makedirs(out_dir, exist_ok=True)

    users, scores, risks = [], [], []
    for _ in range(n_users):
        uid = _uuid(rng)
        dob = datetime(1960, 1, 1) + timedelta(days=rng.randrange(0, 45 * 365))
        cs_ids = [_uuid(rng) for _ in range(rng.randrange(0, 6))]
        tr_ids = [_uuid(rng) for _ in range(rng.randrange(0, 6))]
        users.append(
            {
                "user_id": uid,
                "date_of_birth": dob.strftime("%Y-%m-%d"),
                "diet_type": rng.choice(DIETS),
                # the reference encodes child ids as a Python list literal
                "cognitive_scores": str(cs_ids),
                "risk_trackings": str(tr_ids),
            }
        )
        for cs in cs_ids:
            scores.append(
                {
                    "cs_id": cs,
                    "event_id": _uuid(rng),
                    "timestamp": _iso_ts(rng),
                    "cognitive_score": rng.randrange(1, 101),
                }
            )
        for tr in tr_ids:
            risks.append(
                {
                    "tr_id": tr,
                    "event_id": _uuid(rng),
                    "timestamp": _iso_ts(rng),
                    "steps": rng.randrange(11, 19957),
                    "distance": round(rng.uniform(0.01, 15.96), 2),
                    "hearth_rate": rng.randrange(60, 181),  # source typo
                    "calories": rng.randrange(501, 2999),
                    "risk_metric": rng.choice(RISKS),
                }
            )

    owned_scores, owned_risks = len(scores), len(risks)
    orphan_ids = []
    for _ in range(n_orphans):  # children no user owns → ETL must drop
        oid = _uuid(rng)
        orphan_ids.append(oid)
        scores.append(
            {
                "cs_id": oid,
                "event_id": _uuid(rng),
                "timestamp": _iso_ts(rng),
                "cognitive_score": rng.randrange(1, 101),
            }
        )
        risks.append(
            {
                "tr_id": _uuid(rng),
                "event_id": _uuid(rng),
                "timestamp": _iso_ts(rng),
                "steps": 0,
                "distance": 0.0,
                "hearth_rate": 60,
                "calories": 501,
                "risk_metric": "Low",
            }
        )

    for name, rows in [
        ("users", users),
        ("cognitive_scores", scores),
        ("tracking_risks", risks),
    ]:
        path = os.path.join(out_dir, f"{name}.csv")
        with open(path, "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            writer.writeheader()
            writer.writerows(rows)

    return {
        "n_users": n_users,
        "owned_scores": owned_scores,
        "owned_risks": owned_risks,
        "orphan_score_ids": orphan_ids,
        "csv_scores": len(scores),
        "csv_risks": len(risks),
    }
