"""Synthetic binlog generator (A15 — the reference's "Changing Data"
workload, /root/reference/README.md:212-224, generalized).

Produces deterministic envelope-JSON files for tests: seeded random
insert/update/delete sequences over a keyed or keyless table, with
configurable out-of-order delivery, duplicates (redelivery), and late
events — exactly the failure modes the merge must absorb.
"""

from __future__ import annotations

import json
import os
import random
from datetime import datetime, timedelta


def generate_events(
    n_keys: int = 20,
    n_events: int = 200,
    seed: int = 42,
    start: datetime | None = None,
    p_delete: float = 0.15,
) -> list[dict]:
    """Ordered envelope event dicts (op/ts/seq/table/key/before/after)
    over a toy `pet`-shaped payload keyed by name."""
    rng = random.Random(seed)
    start = start or datetime(2024, 1, 1)
    live: dict[str, dict] = {}
    events: list[dict] = []
    for seq in range(n_events):
        key = f"pet{rng.randrange(n_keys)}"
        ts = start + timedelta(seconds=seq * 7 + rng.randrange(5))
        if key in live and rng.random() < p_delete:
            events.append(
                {"op": "d", "ts": ts.isoformat(), "seq": seq, "table": "pet",
                 "key": key, "before": live.pop(key), "after": None}
            )
            continue
        row = {
            "name": key,
            "owner": f"owner{rng.randrange(5)}",
            "species": rng.choice(["cat", "dog", "bird", "snake", "hamster"]),
            "sex": rng.choice(["f", "m", None]),
            "birth": f"20{rng.randrange(10, 24):02d}-0{rng.randrange(1, 9)}-1{rng.randrange(0, 9)}",
            "death": None,
        }
        op = "u" if key in live else "c"
        events.append(
            {"op": op, "ts": ts.isoformat(), "seq": seq, "table": "pet",
             "key": key, "before": live.get(key), "after": row}
        )
        live[key] = row
    return events


def scramble(
    events: list[dict], seed: int = 7, p_duplicate: float = 0.1, late_fraction: float = 0.1
) -> list[dict]:
    """Simulate at-least-once, out-of-order delivery: shuffle within a
    sliding window, duplicate ~p of events, push a fraction far later."""
    rng = random.Random(seed)
    out = list(events)
    # redeliveries
    for ev in events:
        if rng.random() < p_duplicate:
            out.append(dict(ev))
    # late stragglers: move some early events to the end of the feed
    n_late = int(len(out) * late_fraction)
    for _ in range(n_late):
        i = rng.randrange(len(out) // 2)
        out.append(out.pop(i))
    # local shuffling
    for i in range(len(out) - 2):
        if rng.random() < 0.3:
            j = i + rng.randrange(1, 3)
            if j < len(out):
                out[i], out[j] = out[j], out[i]
    return out


def write_event_files(events: list[dict], dir_path: str, files: int = 5, prefix: str = "chunk") -> list[str]:
    """Split events into JSON-lines files (the change-file objects the
    reference lands on GCS, main.tf:150-155)."""
    os.makedirs(dir_path, exist_ok=True)
    per = max(1, (len(events) + files - 1) // files)
    paths = []
    for i in range(0, len(events), per):
        p = os.path.join(dir_path, f"{prefix}-{i // per:05d}.json")
        with open(p, "w") as f:
            for ev in events[i : i + per]:
                f.write(json.dumps(ev) + "\n")
        paths.append(p)
    return paths
