#!/usr/bin/env python
"""Stamp PROVEN_FINGERPRINTS.json from a driver CORRECTNESS file.

Run at round start, right after the driver commits ``CORRECTNESS_r{N}.json``
(HEAD is then exactly the code the driver checked): for every query the
file records as checked (hash-green, or ``no_oracle`` rows-only), record the
CURRENT source fingerprint from ``registry.query_fingerprints()``. The
rotation in ``registry._rotate_window`` compares these stamps against live
fingerprints — a query edited after its stamp re-enters the driver's
50-query check window instead of hiding behind its old green row.

Mis-stamp guard (VERDICT r10 #1): stamping must happen exactly once per
round, at round START, before new queries are registered. Commit 1696e13
re-stamped round-9 proofs mid-round-10 — hours after the real stamp,
against stale data — and had to be reverted by hand. The tool now refuses
(exit 2) unless ``--force`` is given when either:

* the CORRECTNESS file's round is already recorded in ``STAMP_LOG.json``
  (a second stamp of the same round is almost always a mistake), or
* the file predates the newest registered query — i.e. ``QUERY_ROUNDS.json``
  already contains entries from a LATER round, so HEAD has moved past the
  state the driver checked and the stamps would bless post-proof edits.

Usage::

    python tools/update_fingerprints.py [CORRECTNESS_r03.json] [--force]

With no argument, the newest CORRECTNESS_r*.json in the repo root is used.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

STAMP_PATH = os.path.join(REPO, "PROVEN_FINGERPRINTS.json")
ROUNDS_PATH = os.path.join(REPO, "QUERY_ROUNDS.json")
LOG_PATH = os.path.join(REPO, "STAMP_LOG.json")


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


def _load(path: str, default):
    try:
        with open(path) as f:
            return json.load(f)
    except Exception:
        return default


class StampRefused(RuntimeError):
    """Raised (exit 2 from the CLI) when the guard blocks a stamp run."""


def check_guard(
    this_round: int,
    rounds: dict[str, int],
    stamp_log: dict[str, str],
    force: bool = False,
) -> None:
    """Refuse re-stamps and stale-file stamps unless ``force``.

    ``rounds`` is QUERY_ROUNDS.json content; ``stamp_log`` maps round
    number (as str) → correctness basename of a prior stamp run.
    """
    problems = []
    if str(this_round) in stamp_log:
        problems.append(
            f"round {this_round} was already stamped "
            f"(from {stamp_log[str(this_round)]}); a second stamp of the "
            "same round re-blesses post-proof edits"
        )
    newest = max(rounds.values()) if rounds else 0
    if this_round < newest:
        problems.append(
            f"CORRECTNESS round {this_round} predates the newest registered "
            f"query (QUERY_ROUNDS has round-{newest} entries); stamping a "
            "stale file against current fingerprints blesses unproven code"
        )
    if problems and not force:
        raise StampRefused(
            "REFUSING to stamp:\n  - " + "\n  - ".join(problems) +
            "\nRe-run with --force only if you are certain HEAD matches the "
            "code the driver checked."
        )
    for p in problems:
        print(f"WARNING (forced past guard): {p}")


def stamp(
    path: str,
    *,
    force: bool = False,
    stamp_path: str = STAMP_PATH,
    rounds_path: str = ROUNDS_PATH,
    log_path: str = LOG_PATH,
    fingerprints: dict[str, str] | None = None,
) -> int:
    """Core stamping logic; returns the number of stamps updated.

    ``fingerprints`` may be injected for tests; by default the live
    registry is imported (requires the repo on sys.path).
    """
    if fingerprints is None:
        from aws_saas_etl_spark import registry

        fingerprints = registry.query_fingerprints()

    m = re.search(r"_r0*(\d+)", os.path.basename(path))
    this_round = int(m.group(1)) if m else 0

    stamps = _load(stamp_path, {})
    rounds = _load(rounds_path, {})
    stamp_log = _load(log_path, {})

    check_guard(this_round, rounds, stamp_log, force=force)

    names = checked_names(path)
    updated = 0
    for name in names:
        if name in fingerprints and stamps.get(name) != fingerprints[name]:
            stamps[name] = fingerprints[name]
            updated += 1

    with open(stamp_path, "w") as f:
        json.dump(dict(sorted(stamps.items())), f, indent=1)
        f.write("\n")

    # QUERY_ROUNDS.json: first round each query name existed in the registry
    # (tests/test_entry.py uses it to prove nothing stays driver-invisible).
    # A name registered but not yet in the file existed by the round the
    # correctness file belongs to.
    for name in fingerprints:
        rounds.setdefault(name, this_round)
    with open(rounds_path, "w") as f:
        json.dump(dict(sorted(rounds.items())), f, indent=1)
        f.write("\n")

    stamp_log[str(this_round)] = os.path.basename(path)
    with open(log_path, "w") as f:
        json.dump(dict(sorted(stamp_log.items(), key=lambda kv: int(kv[0]))),
                  f, indent=1)
        f.write("\n")

    print(f"{os.path.basename(path)}: {len(names)} checked, {updated} stamps updated")
    return updated


def main() -> None:
    argv = [a for a in sys.argv[1:] if a != "--force"]
    force = "--force" in sys.argv[1:]
    if argv:
        path = argv[0]
        if not os.path.isabs(path):
            path = os.path.join(REPO, path)
    else:
        candidates = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
        if not candidates:
            print("no CORRECTNESS_r*.json found; nothing to stamp")
            return
        path = candidates[-1]

    try:
        stamp(path, force=force)
    except StampRefused as exc:
        print(exc)
        sys.exit(2)


if __name__ == "__main__":
    main()
