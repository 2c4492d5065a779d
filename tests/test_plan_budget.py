"""Shuffle/scan budget regression harness: every (lazily-planned) registry
query has a committed budget of keyed exchanges and file scans at sf0.001
(tests/plan_budget.json). A rewrite that grows a plan past its budget —
an extra shuffle, a duplicate scan — fails here even if results stay
correct; that silent plan growth is exactly what hurts at 100 TB.

Queries whose fn() executes eagerly (streaming drains, iterative loops,
driver-side fits) are excluded — their cost is runtime, not plan shape,
and is covered by their own tests. Budgets are ceilings: a plan that
IMPROVES (fewer exchanges) passes; regenerate the file to ratchet down
(see scripts in git history / the generation snippet in this module's
commit message)."""

from __future__ import annotations

import contextlib
import io
import json
import pathlib

import pytest

from candyspark.plans import collect_registry

SF = "/root/testdata/sf0.001"
BUDGET = json.loads(
    (pathlib.Path(__file__).parent / "plan_budget.json").read_text()
)
REGISTRY = collect_registry()


@pytest.mark.parametrize("name", sorted(BUDGET))
def test_plan_stays_within_budget(spark, name):
    if name not in REGISTRY:  # budget entry for a renamed/removed query
        pytest.skip(f"{name} no longer registered")
    df = REGISTRY[name].fn(spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    got = {
        "hash_exchanges": plan.count("Arguments: hashpartitioning"),
        "scans": sum(
            1
            for ln in plan.splitlines()
            if ln.startswith("Location: InMemoryFileIndex")
        ),
    }
    want = BUDGET[name]
    assert got["hash_exchanges"] <= want["hash_exchanges"], (
        f"{name}: plan grew to {got['hash_exchanges']} keyed exchanges "
        f"(budget {want['hash_exchanges']}) — new shuffle introduced?\n{plan}"
    )
    assert got["scans"] <= want["scans"], (
        f"{name}: plan grew to {got['scans']} file scans "
        f"(budget {want['scans']}) — duplicate scan introduced?\n{plan}"
    )
