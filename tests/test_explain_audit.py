"""Plan-shape regression gate (VERDICT r8 #4).

``tools/explain_audit.py`` audits ~160 physical plans at round close;
this thin pytest executes its assertions for the LOAD-BEARING subset so
a plan regression fails CI immediately instead of surfacing at the
manual gate. The expectation/forbid patterns are imported FROM the tool
(single source of truth — the test cannot drift from the audit).

The pinned expectations (SURVEY.md §4 / the 100 TB design brief):
- no Python eval (BatchEvalPython/ArrowEvalPython) on the fact-table
  paths of the flagship pipeline stages (P2 normalize, A1/A2/W2 flat
  most-populars);
- J1/J2 zone-dim joins broadcast (BroadcastHashJoin, never SMJ);
- T1 top-k plans as TakeOrderedAndProject (per-partition heaps), never
  a global range sort;
- trend_slope's scalar epoch rides the sanctioned 1-row broadcast BNLJ
  — any hash/sort-merge join or true cartesian is a regression;
- decontamination stays a gram equi-join, never doc×doc.
"""

from __future__ import annotations

import importlib.util
import os
import re

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_spec = importlib.util.spec_from_file_location(
    "explain_audit", os.path.join(_ROOT, "tools", "explain_audit.py")
)
_audit = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_audit)

# The load-bearing subset: reference-surface operators (the flagship
# path) + the two shapes the r7/r8 verdicts called out by name.
_LOAD_BEARING = (
    "normalize_filter",
    "most_populars_flat",
    "broadcast_left_join",
    "multihop_join",
    "topk_limit",
    "trend_slope_by_event_type",
    "corpus_decontaminate",
    "flagship_known_zones",
)


@pytest.mark.parametrize("name", _LOAD_BEARING)
def test_plan_shape_pinned(spark, sf_dir, name):
    from taxi_trips_etl_spark.queries import all_queries

    df = all_queries()[name](spark, sf_dir)
    plan = _audit.plan_of(df)
    for pat in _audit.EXPECT.get(name, []):
        assert re.search(pat, plan), (
            f"{name}: expected {pat!r} not in physical plan"
        )
    for pat in _audit.FORBID.get(name, []):
        assert not re.search(pat, plan), (
            f"{name}: forbidden {pat!r} present in physical plan"
        )


def test_load_bearing_names_still_audited():
    """Every pinned name must still carry patterns in the tool's maps —
    a rename there would silently turn this gate vacuous."""
    for name in _LOAD_BEARING:
        assert name in _audit.EXPECT or name in _audit.FORBID, (
            f"{name} lost its audit patterns in tools/explain_audit.py"
        )


def test_topk_is_heap_not_global_sort(spark, sf_dir):
    """T1 specifically: TakeOrderedAndProject AND no range-partition
    exchange — the global-sort plan would shuffle everything to sort
    100 rows out."""
    from taxi_trips_etl_spark.queries import all_queries

    plan = _audit.plan_of(all_queries()["topk_limit"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_py_eval_whitelist_names_exist():
    """The global Python-eval rule (tools/explain_audit.py, round 11) is
    only as good as its whitelist: a renamed entry would silently turn a
    whitelisted name into dead config while the renamed query escapes
    the rule until the next tool run. Pin the names to the registry."""
    from taxi_trips_etl_spark.queries import all_queries

    qs = all_queries()
    for name in _audit.PY_EVAL_WHITELIST:
        assert name in qs or name == "flagship_most_populars", (
            f"PY_EVAL_WHITELIST name {name!r} is not a registry entry"
        )
