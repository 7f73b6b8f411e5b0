"""Driver-contract invariants for __spark_entry__ — pure inspection,
no SparkSession: the window stays exactly 50 balanced keys, every
oracle belongs to a declared query, and the py-model registry stays
disjoint from the SQL oracles (a query must have ONE authoritative
local oracle)."""

from __future__ import annotations

import inspect
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entry


def test_queries_window_contract():
    qs = entry.queries()
    keys = list(qs)
    assert len(keys) >= 50
    assert len(set(keys)) == len(keys), "duplicate query keys"
    for name, fn in qs.items():
        assert callable(fn), name
        params = inspect.signature(fn).parameters
        assert len(params) == 2, f"{name} must take (spark, sf_dir)"


def test_oracles_reference_declared_queries():
    qs = entry.queries()
    oracles = entry.oracle_sql()
    dangling = [k for k in oracles if k not in qs]
    assert dangling == []
    # every oracle references at least one registered table view
    tables = (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split()
    import re as _re

    # pinned-twin oracles may state a constant expected table literally
    # (pack_bins_pinned pattern) instead of reading a view — but only a
    # genuine row-constructor counts, not any SQL that mentions "VALUES"
    values_tbl = _re.compile(r"(?:FROM\s*\(\s*VALUES|\(\s*VALUES\s*\()", _re.I)
    for name, sql in oracles.items():
        assert any(t in sql for t in tables) or values_tbl.search(sql), name


def test_py_models_disjoint_from_sql_oracles():
    from tools.pymodels import PY_MODELS

    qs = entry.queries()
    oracles = entry.oracle_sql()
    for name in PY_MODELS:
        assert name in qs, name
        assert name not in oracles, (
            f"{name} has BOTH a py-model and a SQL oracle — ambiguous"
        )
