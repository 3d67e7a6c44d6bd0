"""Mis-stamp guard for tools/update_fingerprints.py (VERDICT r10 #1).

Commit 1696e13 re-stamped round-9 proofs mid-round-10 — against stale data —
and had to be reverted by hand. The tool must refuse (a) re-stamping a round
already recorded in STAMP_LOG.json and (b) stamping a CORRECTNESS file that
predates the newest registered query, unless ``--force`` is passed.

All paths are injected; the repo's real stamp files are never touched.
"""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from update_fingerprints import StampRefused, check_guard, stamp  # noqa: E402


def _write(path, obj):
    with open(path, "w") as f:
        json.dump(obj, f)
    return str(path)


@pytest.fixture
def stamp_env(tmp_path):
    corr = _write(
        tmp_path / "CORRECTNESS_r07.json",
        {
            "q_green": {"hash_match": True, "err": None},
            "q_rowsonly": {"hash_match": False, "err": "no_oracle"},
            "q_failed": {"hash_match": False, "err": "boom"},
        },
    )
    return {
        "path": corr,
        "stamp_path": str(tmp_path / "PROVEN.json"),
        "rounds_path": _write(tmp_path / "ROUNDS.json", {"q_green": 5}),
        "log_path": str(tmp_path / "LOG.json"),
        "fingerprints": {"q_green": "fp1", "q_rowsonly": "fp2", "q_failed": "fp3"},
    }


def test_fresh_stamp_records_green_and_rowsonly_not_failed(stamp_env):
    updated = stamp(stamp_env.pop("path"), **stamp_env)
    assert updated == 2
    stamps = json.load(open(stamp_env["stamp_path"]))
    assert set(stamps) == {"q_green", "q_rowsonly"}
    rounds = json.load(open(stamp_env["rounds_path"]))
    # existing first-round entries preserved; new names get this round
    assert rounds == {"q_green": 5, "q_rowsonly": 7, "q_failed": 7}
    log = json.load(open(stamp_env["log_path"]))
    assert log == {"7": "CORRECTNESS_r07.json"}


def test_restamp_same_round_refused_then_forced(stamp_env):
    path = stamp_env.pop("path")
    stamp(path, **stamp_env)
    with pytest.raises(StampRefused, match="already stamped"):
        stamp(path, **stamp_env)
    # --force path still works (prints a warning, does not raise)
    stamp(path, force=True, **stamp_env)


def test_stale_correctness_file_refused(stamp_env):
    # QUERY_ROUNDS already has a round-9 registration: a round-7 file is
    # stale and would bless post-proof edits.
    _write(stamp_env["rounds_path"], {"q_green": 5, "q_newer": 9})
    with pytest.raises(StampRefused, match="predates the newest registered"):
        stamp(stamp_env.pop("path"), **stamp_env)


def test_check_guard_pure():
    check_guard(10, {"a": 9}, {"9": "CORRECTNESS_r09.json"})
    with pytest.raises(StampRefused):
        check_guard(9, {"a": 9}, {"9": "CORRECTNESS_r09.json"})
    with pytest.raises(StampRefused):
        check_guard(8, {"a": 9}, {})
    check_guard(8, {"a": 9}, {}, force=True)
