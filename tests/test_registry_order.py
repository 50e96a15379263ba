"""Registry priority-ordering contract (SURVEY §2, VERDICT r2 item 1/5).

The driver verifies only a prefix of ``__spark_entry__.queries()``; the
registry must therefore emit least-recently-driver-verified queries first so
coverage rotates across rounds automatically.
"""

from __future__ import annotations

import json

from map_reduce_in_go_spark import registry


def test_order_is_monotone_in_verified_round():
    # Behavior-changed queries front the window with an effective round of 0
    # (their stale green rows validate output that no longer exists), so
    # monotonicity is on the same effective key _priority_order() sorts by.
    verified = registry._verified_round()
    names = list(registry.queries())
    rounds = [
        0 if n in registry._CHANGED_SINCE_VERIFIED else verified.get(n, 0)
        for n in names
    ]
    assert rounds == sorted(rounds), "queries() must be least-recently-verified first"


def test_never_verified_queries_lead_the_window():
    verified = registry._verified_round()
    names = list(registry.queries())
    never = [
        n
        for n in names
        if verified.get(n, 0) == 0 or n in registry._CHANGED_SINCE_VERIFIED
    ]
    # Every never-driver-checked query must precede every driver-checked one.
    if never:
        last_never = max(names.index(n) for n in never)
        first_checked = min(
            (names.index(n) for n in names if n not in never),
            default=len(names),
        )
        assert last_never < first_checked


def test_failed_rows_do_not_count_as_verified(tmp_path, monkeypatch):
    monkeypatch.setattr(registry, "_REPO_ROOT", tmp_path)
    (tmp_path / "CORRECTNESS_r09.json").write_text(
        json.dumps(
            {
                "good": {"hash_match": True, "spark_rows": 3, "err": None},
                "bad_hash": {"hash_match": False, "spark_rows": 3, "err": None},
                "errored": {"hash_match": None, "spark_rows": None, "err": "boom"},
                "rows_only": {"hash_match": None, "spark_rows": 5, "err": "no_oracle"},
            }
        )
    )
    vr = registry._verified_round()
    assert vr == {"good": 9, "rows_only": 9}


def test_malformed_correctness_file_is_ignored(tmp_path, monkeypatch):
    monkeypatch.setattr(registry, "_REPO_ROOT", tmp_path)
    (tmp_path / "CORRECTNESS_r01.json").write_text("{not json")
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps([1, 2]))
    assert registry._verified_round() == {}


def test_oracle_keys_subset_of_queries():
    qs = registry.queries()
    for k in registry.oracles():
        assert k in qs
