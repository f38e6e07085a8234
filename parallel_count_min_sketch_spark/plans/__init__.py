"""Query registry: every implemented operator exposed through the driver
contract (queries + DuckDB oracle SQL)."""

from __future__ import annotations


def _registry() -> dict[str, tuple]:
    from .cms_queries import CMS_QUERIES

    reg: dict[str, tuple] = {}
    reg.update(CMS_QUERIES)
    try:
        from .sketch_queries import SKETCH_QUERIES

        reg.update(SKETCH_QUERIES)
    except ImportError:
        pass
    try:
        from .textdata_queries import TEXTDATA_QUERIES

        reg.update(TEXTDATA_QUERIES)
    except ImportError:
        pass
    return reg


def all_queries():
    return {name: fn for name, (fn, _sql) in _registry().items()}


def all_oracles():
    return {name: sql for name, (_fn, sql) in _registry().items() if sql is not None}
