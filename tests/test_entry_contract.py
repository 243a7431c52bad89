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


def test_value_hash_properties():
    """The correctness gate's hash: row/column order insensitive,
    value sensitive, float-format stable."""
    sys.path.insert(0, "/root/repo/scripts")
    from selfcheck import value_hash

    rows = [(1, "a", 2.5), (2, "b", 3.5)]
    cols = ["x", "s", "v"]
    h = value_hash(rows, cols)
    # row order insensitive
    assert value_hash(list(reversed(rows)), cols) == h
    # column order insensitive (values permuted consistently)
    perm_rows = [(r[1], r[0], r[2]) for r in rows]
    assert value_hash(perm_rows, ["s", "x", "v"]) == h
    # value sensitive
    assert value_hash([(1, "a", 2.5), (2, "b", 3.50001)], cols) != h
    # 6dp float formatting: 2.5 vs 2.5000000001 collide (by design), 1e-5 doesn't
    assert value_hash([(1, "a", 2.5000000001), (2, "b", 3.5)], cols) == h
