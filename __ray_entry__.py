"""Driver contract for the ahrd_ray engine.

The driver initialises Ray BEFORE importing this module; nothing here (or in
the library) calls ``ray.init`` / ``ray.shutdown``.

* ``entry()`` — flagship KG-construction pipeline on sf0.001, returns the
  deduplicated sorted (subj, pred, obj) edge Dataset.
* ``queries()`` — one callable per implemented operator (SURVEY.md §2).
* ``oracle_sql()`` — DuckDB-equivalent SQL for every SQL-expressible query.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry() -> Any:
    from ahrd_ray.pipelines import kg

    ctx = kg.PipelineContext("/root/testdata/sf0.001")
    return kg.kg_triples(ctx)


def queries() -> dict[str, Callable[[str], Any]]:
    from ahrd_ray.pipelines.queriesdef import registry

    return {name: fn for name, (fn, _sql) in registry().items()}


def oracle_sql() -> dict[str, str]:
    from ahrd_ray.pipelines.queriesdef import registry

    return {name: sql for name, (_fn, sql) in registry().items() if sql is not None}
