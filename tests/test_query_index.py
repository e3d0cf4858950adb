"""queries/INDEX.md freshness gate (VERDICT r10 #4).

The index is generated, never hand-edited; this test re-renders it from
the live registry and fails if the committed file drifted — i.e. a new
``register()`` entry landed without re-running
``python tools/gen_query_index.py``.
"""

from __future__ import annotations

import importlib.util
import os

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tool():
    spec = importlib.util.spec_from_file_location(
        "gen_query_index", os.path.join(_ROOT, "tools", "gen_query_index.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_index_md_matches_fresh_render():
    tool = _tool()
    with open(tool.OUT, encoding="utf-8") as f:
        on_disk = f.read()
    assert on_disk == tool.render(), (
        "queries/INDEX.md is stale — run `python tools/gen_query_index.py`"
    )


def test_every_entry_has_provenance():
    from taxi_trips_etl_spark.queries import _QUERIES
    from taxi_trips_etl_spark.queries._registry import _PROVENANCE

    missing = [n for n in _QUERIES if n not in _PROVENANCE]
    assert not missing, missing
    blank = [n for n, (mod, _) in _PROVENANCE.items() if not mod]
    assert not blank, blank
