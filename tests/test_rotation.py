"""Driver-window rotation safety net (VERDICT r04 item 6).

The correctness driver hash-checks only the FIRST 50 entries of
``queries()`` per round, so cumulative coverage depends on a deliberate
per-round rotation of ``DRIVER_PRIORITY`` in gate.py. Two failure modes
have bitten before and are pinned here:

1. A name in the priority list that is not registered (typo / rename)
   silently shrinks the checked window — registry._ordered drops it.
2. A registered query left outside the window that has never earned a
   driver-green row stays unchecked forever (``rel_conditional_distinct``
   sat unchecked through round 3 this way).

Neither check needs Spark; both read static registration order plus the
committed CORRECTNESS_r*.json history.
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WINDOW = 50


def _registered_names() -> list[str]:
    import __spark_entry__ as entry

    return list(entry.queries().keys())


def _green_history() -> set[str]:
    green: set[str] = set()
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            rows = json.load(f)
        for name, rec in rows.items():
            if not isinstance(rec, dict):
                continue
            ok = (
                rec.get("rows_match")
                and rec.get("schema_match") is not False
                and rec.get("hash_match") is not False
            )
            if ok:
                green.add(name)
    return green


def test_priority_names_all_registered():
    from hive_server_spark.gate import DRIVER_PRIORITY_R15
    from hive_server_spark.registry import _SPARK_QUERIES

    missing = [n for n in DRIVER_PRIORITY_R15 if n not in _SPARK_QUERIES]
    assert not missing, f"priority names not registered: {missing}"
    assert len(DRIVER_PRIORITY_R15) == len(set(DRIVER_PRIORITY_R15)), "dup names"


def test_window_is_exactly_the_priority_list():
    from hive_server_spark.gate import DRIVER_PRIORITY_R15

    names = _registered_names()
    assert names[:WINDOW] == DRIVER_PRIORITY_R15


def test_every_query_outside_window_has_prior_green_row():
    """No registered query may be both outside the checked window AND
    without a driver-green row in some prior round — that combination means
    a query the driver will never validate this round and never has."""
    names = _registered_names()
    outside = names[WINDOW:]
    green = _green_history()
    unchecked = [n for n in outside if n not in green]
    assert not unchecked, (
        "queries outside the driver window with no prior green CORRECTNESS "
        f"row (front-load them in DRIVER_PRIORITY): {unchecked}"
    )


def test_no_bare_mkdtemp_outside_session_scratch():
    """Every scratch/landing dir in the query packs must live under the
    PID-reaped ``session_scratch`` root (VERDICT r12 item 3): a bare
    ``tempfile.mkdtemp(prefix=...)`` accumulates in /tmp across gate and
    bench runs with nothing to reclaim it. ``mkdtemp(dir=session_scratch(
    ...))`` keeps per-invocation uniqueness (streaming checkpoints must
    not be reused) while bounding /tmp to one root per live process."""
    import re

    pkg = os.path.join(REPO, "hive_server_spark")
    offenders = []
    for dirpath, _dirs, files in os.walk(pkg):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            with open(path) as f:
                for i, line in enumerate(f, 1):
                    if "mkdtemp(" not in line or line.lstrip().startswith("#"):
                        continue
                    if not re.search(r"mkdtemp\(\s*dir=session_scratch", line):
                        offenders.append(f"{os.path.relpath(path, REPO)}:{i}")
    assert not offenders, (
        f"bare mkdtemp outside session_scratch: {offenders}"
    )


def test_every_query_has_a_coverage_row():
    """COVERAGE.md is the judge-facing claims ledger; a registered query
    absent from it is an undocumented capability (round-5 verdict flagged
    stale ledger rows). Every name must appear verbatim — no wildcard
    family rows."""
    with open(os.path.join(REPO, "COVERAGE.md")) as f:
        text = f.read()
    missing = [n for n in _registered_names() if n not in text]
    assert not missing, f"queries with no COVERAGE.md mention: {missing}"


def test_rotation_staleness_bounded():
    """VERDICT r13 item 4: as the registry outgrows the 50-slot driver
    window, a mis-executed rotation (or simple creep) could leave some
    registered query unchecked for many rounds with nothing failing.
    Compute, from the committed CORRECTNESS_r*.json history plus the
    CURRENT window, the staleness every registered query would reach
    after this round's window executes, and bound it at 5 rounds. A
    query in the current window lands at 0; everything else ages by
    (this_round - last_green). New registrations outside the window are
    caught by test_every_query_outside_window_has_prior_green_row."""
    import re

    last_green: dict[str, int] = {}
    rounds: list[int] = []
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        rounds.append(rnd)
        with open(path) as f:
            rows = json.load(f)
        for name, rec in rows.items():
            if not isinstance(rec, dict):
                continue
            ok = (
                rec.get("rows_match")
                and rec.get("schema_match") is not False
                and rec.get("hash_match") is not False
            )
            if ok:
                last_green[name] = max(rnd, last_green.get(name, 0))
    assert rounds, "no correctness history found"
    this_round = max(rounds) + 1

    names = _registered_names()
    window = set(names[:WINDOW])
    over = {
        n: this_round - last_green[n]
        for n in names
        if n not in window
        and n in last_green
        and this_round - last_green[n] > 5
    }
    assert not over, (
        "registered queries would exceed 5 rounds since their last "
        f"driver-green check after this round's window: {over} — rotate "
        "them into DRIVER_PRIORITY or shrink the registration cadence"
    )


# The written flip schedule from the gate.py rotation note (round 14,
# re-affirmed round 15). A staging decision that adds a name here — or
# registers one early — must re-run the simulation below and keep the
# bound, IN THE ROUND THAT STAGES IT, not three rounds later.
PLANNED_FLIPS: dict[int, list[str]] = {
    16: [
        "layout_zonemap_streaming",
        "emb_ivf_delete_maintenance",
        "serving_order_book_json",
        "dq_referential_report",
    ],
    17: [
        "text_bpe_streaming",
        "serving_amount_out_json",
        "audio_neardup_streaming",
    ],
}
SIM_HORIZON = 20  # staging note's claim: bound holds through r20


def _forward_violations(planned_flips: dict[int, list[str]]) -> list[tuple]:
    """Drain-oldest-first rotation simulation from the committed
    correctness history through SIM_HORIZON: per round R, window = that
    round's planned flips (staleness 0 at registration) + the
    oldest-last-green registered names, ties broken by registration
    order — exactly how the written window plans are constructed
    (cohorts drain in registration order, oldest cohort first). Returns
    (violations, max_stale_by_round): every (round, name, staleness)
    where a name's age at the NEXT window's selection would exceed 5
    rounds, plus the maximum post-window age observed per round."""
    import re

    last_green: dict[str, int] = {}
    rounds: list[int] = []
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        rounds.append(rnd)
        with open(path) as f:
            rows = json.load(f)
        for name, rec in rows.items():
            if not isinstance(rec, dict):
                continue
            ok = (
                rec.get("rows_match")
                and rec.get("schema_match") is not False
                and rec.get("hash_match") is not False
            )
            if ok:
                last_green[name] = max(rnd, last_green.get(name, 0))
    assert rounds, "no correctness history found"
    this_round = max(rounds) + 1

    # Registration order of the live registry; planned flips append in
    # schedule order when their round arrives.
    names = _registered_names()
    reg_index = {n: i for i, n in enumerate(names)}

    # This round's window is the committed DRIVER_PRIORITY list, not a
    # simulation — apply it first.
    for n in names[:WINDOW]:
        last_green[n] = this_round

    violations: list[tuple] = []
    max_stale_by_round: dict[int, int] = {}
    sim_names = list(names)
    for rnd in range(this_round + 1, SIM_HORIZON + 1):
        flips = planned_flips.get(rnd, [])
        for n in flips:
            assert n not in reg_index, (
                f"planned r{rnd} flip {n!r} is already registered — "
                "update PLANNED_FLIPS and the gate.py rotation note"
            )
            reg_index[n] = len(sim_names)
            sim_names.append(n)
        backlog = sorted(
            (n for n in sim_names if n not in flips),
            key=lambda n: (last_green.get(n, 0), reg_index[n]),
        )
        window = list(flips) + backlog[: WINDOW - len(flips)]
        assert len(window) == WINDOW, (rnd, len(window))
        for n in window:
            last_green[n] = rnd
        ages = [rnd + 1 - last_green.get(n, 0) for n in sim_names]
        max_stale_by_round[rnd] = max(ages)
        violations.extend(
            (rnd, n, rnd + 1 - last_green.get(n, 0))
            for n in sim_names
            if rnd + 1 - last_green.get(n, 0) > 5
        )
    return violations, max_stale_by_round


def test_rotation_forward_simulation():
    """VERDICT r14 item 7: encode the staging-budget note's simulation —
    drain-oldest-first over the CURRENT registry plus the written
    r16/r17 flip schedule must hold every query's staleness at <= 5
    rounds through r20 — so a staging decision that silently breaks a
    LATER round's bound fails in the round that stages it. The note's
    sharper claim is also pinned: the oldest cohort sits at EXACTLY the
    bound (age 5) after every simulated window through the horizon —
    the rotation runs with zero margin for a mis-executed round, which
    is WHY extra registrations beyond the written schedule need this
    simulation re-run before staging (they consume the slack this
    policy's full-cohort drains otherwise preserve)."""
    violations, max_stale = _forward_violations(PLANNED_FLIPS)
    assert not violations, (
        "simulated rotation exceeds the 5-round staleness bound: "
        f"{violations} — the staging schedule overfills the 50-slot window"
    )
    assert set(max_stale.values()) == {5}, (
        "the oldest cohort no longer sits at exactly the 5-round bound "
        f"each simulated round ({max_stale}) — the gate.py staging note's "
        "arithmetic is stale; recompute it before changing the schedule"
    )


def test_rotation_forward_simulation_has_teeth():
    """The guard must be able to fail: a grossly overfilled schedule
    (40 hypothetical extra r16 registrations — enough that some round's
    age-5 backlog plus its flips exceeds the 50-slot window) must
    produce bound violations before r20. This pins that the simulation
    actually measures window pressure, not vacuously passing — and
    documents that the measured slack under drain-oldest-first is
    finite and consumed by registration count alone."""
    flips = {r: list(ns) for r, ns in PLANNED_FLIPS.items()}
    flips[16] = flips.get(16, []) + [
        f"hypothetical_extra_query_{i}" for i in range(40)
    ]
    violations, _ = _forward_violations(flips)
    assert violations, (
        "40 extra r16 registrations no longer violate the staleness "
        "bound — the simulation lost its teeth"
    )
