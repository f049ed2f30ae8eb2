"""Driver-contract registry invariants: every query oracle-paired, and the
driver-window auto-rotation (never-driver-green queries iterate first, so the
50-row CORRECTNESS prefix window always samples the unverified ones)."""

from __future__ import annotations

from openfactverification_spark import entry_queries as eq


def test_every_query_is_oracle_paired():
    qs = eq.build_queries()
    oracles = eq.build_oracle_sql()
    assert set(qs) <= set(oracles), sorted(set(qs) - set(oracles))
    assert len(qs) >= 106


def test_auto_rotation_floats_never_green_first(monkeypatch):
    """Simulated round 5: when the CORRECTNESS history marks everything green
    except two late additions, those two must lead the iteration order — no
    manual priority-list edit required."""
    all_names = set(eq.build_queries())
    newbies = {"embed_lsh_recall_multiprobe", "pipeline_observe_metrics"}
    monkeypatch.setattr(eq, "_driver_green_names", lambda: all_names - newbies)
    order = list(eq.build_queries())
    assert set(order[: len(newbies)]) == newbies
    assert len(order) == len(all_names)  # rotation reorders, never drops


def test_fresh_checkout_falls_back_to_static_priority(monkeypatch):
    """Without readable CORRECTNESS files (packaged zip / fresh clone), the
    static round-4 priority leads — chunk_passages first (its only driver row
    before round 4 was the r1 FAIL)."""
    monkeypatch.setattr(eq, "_driver_green_names", lambda: set())
    order = list(eq.build_queries())
    assert order[0] == "chunk_passages"
    static = eq._NEVER_DRIVER_GREEN_R3 + eq._ROUND4_PRIORITY
    assert set(order[: len(static)]) == set(static)


def test_current_window_covers_all_never_green():
    """On this checkout (r1-r3 CORRECTNESS files present) every query without
    a historical green driver row must sit inside the 50-row prefix window."""
    green = eq._driver_green_names()
    if not green:  # packaged environment without the files — nothing to pin
        return
    order = list(eq.build_queries())
    never = [n for n in order if n not in green]
    assert never == order[: len(never)]
    assert len(never) <= 50
