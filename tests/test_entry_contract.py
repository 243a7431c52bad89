"""Driver-contract invariants: every oracle has a query, names are
stable identifiers, entry() exists — drift guard for __spark_entry__."""

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod


def test_contract_shape():
    qs = entry_mod.queries()
    os_ = entry_mod.oracle_sql()
    assert len(qs) >= 74
    assert set(os_) <= set(qs), f"orphan oracles: {set(os_) - set(qs)}"
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and s.strip().upper().startswith(("SELECT", "WITH"))
               for s in os_.values())
    assert all(n.startswith("q_") and n.replace("_", "").isalnum() for n in qs)
    assert callable(entry_mod.entry)


def test_oracle_coverage_floor():
    """At least 85% of queries must stay under a value-level oracle —
    don't let rows-only entries quietly accumulate."""
    qs = entry_mod.queries()
    os_ = entry_mod.oracle_sql()
    assert len(os_) / len(qs) >= 0.85
