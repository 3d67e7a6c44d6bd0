#!/usr/bin/env python
"""Stamp PROVEN_FINGERPRINTS.json from a driver CORRECTNESS file.

Run at round start, right after the driver commits ``CORRECTNESS_r{N}.json``
(HEAD is then exactly the code the driver checked): for every query the
file records as checked (hash-green, or ``no_oracle`` rows-only), record the
CURRENT source fingerprint from ``registry.query_fingerprints()``. The
rotation in ``registry._rotate_window`` compares these stamps against live
fingerprints — a query edited after its stamp re-enters the driver's
50-query check window instead of hiding behind its old green row.

Usage::

    python tools/update_fingerprints.py [CORRECTNESS_r03.json]

With no argument, the newest CORRECTNESS_r*.json in the repo root is used.
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

STAMP_PATH = os.path.join(REPO, "PROVEN_FINGERPRINTS.json")
ROUNDS_PATH = os.path.join(REPO, "QUERY_ROUNDS.json")


def checked_names(correctness_path: str) -> list[str]:
    with open(correctness_path) as f:
        data = json.load(f)
    out = []
    for name, row in data.items():
        if not isinstance(row, dict):
            continue
        err = row.get("err")
        if (err is None and row.get("hash_match")) or err == "no_oracle":
            out.append(name)
    return out


def main() -> None:
    if len(sys.argv) > 1:
        path = sys.argv[1]
        if not os.path.isabs(path):
            path = os.path.join(REPO, path)
    else:
        candidates = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
        if not candidates:
            print("no CORRECTNESS_r*.json found; nothing to stamp")
            return
        path = candidates[-1]

    from aws_saas_etl_spark import registry

    current = registry.query_fingerprints()
    try:
        with open(STAMP_PATH) as f:
            stamps = json.load(f)
    except Exception:
        stamps = {}

    names = checked_names(path)
    updated = 0
    for name in names:
        if name in current and stamps.get(name) != current[name]:
            stamps[name] = current[name]
            updated += 1

    with open(STAMP_PATH, "w") as f:
        json.dump(dict(sorted(stamps.items())), f, indent=1)
        f.write("\n")

    # QUERY_ROUNDS.json: first round each query name existed in the registry
    # (tests/test_entry.py uses it to prove nothing stays driver-invisible).
    # A name registered but not yet in the file existed by the round the
    # correctness file belongs to.
    import re

    m = re.search(r"_r0*(\d+)", os.path.basename(path))
    this_round = int(m.group(1)) if m else 0
    try:
        with open(ROUNDS_PATH) as f:
            rounds = json.load(f)
    except Exception:
        rounds = {}
    for name in current:
        rounds.setdefault(name, this_round)
    with open(ROUNDS_PATH, "w") as f:
        json.dump(dict(sorted(rounds.items())), f, indent=1)
        f.write("\n")

    print(f"{os.path.basename(path)}: {len(names)} checked, {updated} stamps updated")


if __name__ == "__main__":
    main()
