"""The driver-cap rotation: queries with a clean row in any accumulated
CORRECTNESS_r*.json yield their front-of-registry slots to never-checked
ones, so the ~50-row driver gate cycles through the whole registry over
rounds. These tests pin the history parser and the reordering contract."""

from __future__ import annotations

import json

from nyc_taxi_lakehouse_spark.registry import _driver_checked_names, all_queries


def _write(tmp_path, name, rows):
    (tmp_path / name).write_text(json.dumps(rows))


def test_checked_names_parse_rules(tmp_path):
    _write(
        tmp_path,
        "CORRECTNESS_r01.json",
        {
            "q_green": {"rows_match": True, "schema_match": True,
                        "hash_match": True, "err": None},
            "q_rows_only": {"rows_match": True, "schema_match": None,
                            "hash_match": None, "err": "no_oracle"},
            "q_crashed": {"rows_match": None, "schema_match": None,
                          "hash_match": None, "err": "TypeError: boom"},
            "q_wrong": {"rows_match": True, "schema_match": True,
                        "hash_match": False, "err": None},
        },
    )
    _write(
        tmp_path,
        "CORRECTNESS_r02.json",
        {"q_late_green": {"rows_match": True, "schema_match": True,
                          "hash_match": True, "err": None}},
    )
    got = _driver_checked_names(str(tmp_path))
    # green and rows-only-completed rows count as checked; crashes and
    # mismatches stay unchecked so the driver re-presents them
    assert got == {"q_green", "q_rows_only", "q_late_green"}


def test_checked_names_ignore_garbage(tmp_path):
    (tmp_path / "CORRECTNESS_r01.json").write_text("not json {")
    _write(tmp_path, "CORRECTNESS_r02.json", {"q_ok": {"err": None}})
    assert _driver_checked_names(str(tmp_path)) == {"q_ok"}


def test_rotation_puts_unchecked_first():
    """Against the real repo history: the first 50 iterated queries must
    all be names without a clean driver row yet (while any exist)."""
    checked = _driver_checked_names()
    names = list(all_queries())
    unchecked_total = sum(1 for n in names if n not in checked)
    head = names[: min(50, unchecked_total)]
    assert all(n not in checked for n in head)
    # and nothing is lost or duplicated by the reordering
    assert len(names) == len(set(names))
