"""Enforce the mechanical correctness-window rotation policy.

The driver's correctness gate checks the FIRST 50 entries of
``__spark_entry__.queries()``.  Policy (adopted round 4, made permanent
round 5): slots 1-8 are the reserved SURVEY §2 reference-parity core,
slots 9-50 rotate never-driver-verified-first then oldest-green-first.
``scripts/next_window.py`` derives the window mechanically from the
committed CORRECTNESS_r*.json files plus the registry itself; the
registry's literal prefix must equal that derivation so the window is
reproducible from repository state alone (VERDICT_r04 ask #6).
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))
sys.path.insert(0, REPO)

import __spark_entry__ as entry  # noqa: E402
from next_window import CORE, WINDOW_SIZE, next_window  # noqa: E402


def test_window_prefix_is_core():
    keys = list(entry.queries().keys())
    assert keys[: len(CORE)] == CORE, (
        "the first 8 registry slots must be the reserved SURVEY §2 core"
    )


def test_window_matches_mechanical_derivation():
    keys = list(entry.queries().keys())
    win, _never = next_window(REPO)
    assert keys[:WINDOW_SIZE] == win, (
        "queries() prefix must equal scripts/next_window.py output — "
        "reorder the registry (or rerun the script) after adding queries "
        "or landing a CORRECTNESS file"
    )


def test_window_is_fixed_point():
    # Recomputing the window from the reordered registry must reproduce
    # it: the rotation is stable, not order-dependent on its own output.
    win1, _ = next_window(REPO)
    assert win1 == entry._R5_WINDOW


def test_oracle_coverage_of_window():
    # Every window entry needs an oracle (or a documented non-SQL
    # exemption — none of the current window entries are exempt).
    oracles = entry.oracle_sql()
    win, _ = next_window(REPO)
    missing = [n for n in win if n not in oracles]
    assert missing == [], f"window entries without an oracle: {missing}"
