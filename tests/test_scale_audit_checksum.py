"""Pins for the sf1 audit's value-checksum tier (tools/scale_audit.py).

The checksum replaces "executed-only" for >ROW_CAP oracle results: both
engines stream rows through ONE canonical serializer into an
order-insensitive (count, sum-of-md5) digest. These tests pin the
serializer's equivalence relation — it must call equal exactly the
cross-engine type pairs the full-compare normalizer (gate_sim_lib
norm_rows, Python ==) calls equal — and the digest's sensitivity.
No Spark session needed: the canon is pure Python by design, which is
what lets the identical function run on the DuckDB driver side and
inside Spark Python workers.
"""

from __future__ import annotations

import datetime
import sys
from decimal import Decimal

TOOLS = "/root/repo/tools"


def _load():
    """Import canon_cell/digest_rows without tripping the script's
    repo-root cwd guard (chdir to /tmp for the exec) or running main()."""
    import os

    src = open(f"{TOOLS}/scale_audit.py").read()
    src = src[: src.index("def main()")]
    g = {"__file__": f"{TOOLS}/scale_audit.py"}
    argv, cwd = sys.argv, os.getcwd()
    try:
        sys.argv = ["scale_audit_under_test"]
        os.chdir("/tmp")
        exec(compile(src, "scale_audit_defs", "exec"), g)
    finally:
        sys.argv = argv
        os.chdir(cwd)
    return g["canon_cell"], g["digest_rows"]


CANON, DIGEST = _load()


def test_numeric_unification_matches_gate_equality():
    # the pairs Python == (the full-compare relation) calls equal
    assert CANON(3) == CANON(3.0) == CANON(Decimal("3.00")) == "3"
    assert CANON(1.5) == CANON(Decimal("1.50"))
    assert CANON(-0.0) == CANON(0.0) == CANON(Decimal("0.00"))
    assert CANON(float("nan")) == CANON(None)  # norm_cell maps NaN -> None
    # round-6, same as norm_cell
    assert CANON(1.2345678) == CANON(1.2345681)
    assert CANON(1.234567) != CANON(1.234577)


def test_type_tags_prevent_cross_type_collisions():
    assert CANON("3") != CANON(3)
    assert CANON(True) != CANON(1)
    assert CANON("") != CANON(None)
    assert CANON(b"ab") != CANON("ab")
    assert CANON([1, 2]) != CANON("12")


def test_temporal_matches_norm_cell_isoformat():
    assert CANON(datetime.date(2024, 1, 2)) == "d2024-01-02"
    assert (
        CANON(datetime.datetime(2024, 1, 2, 3, 4, 5)) == "d2024-01-02T03:04:05"
    )


def test_digest_is_order_insensitive_multiset_compare():
    rows = [(1, "x"), (2, "y"), (3, "z")]
    a = DIGEST(rows, [0, 1])
    b = DIGEST(list(reversed(rows)), [0, 1])
    assert a == b
    assert a[0] == 3
    # value change, multiplicity change, and row-count change all move it
    assert a != DIGEST([(1, "x"), (2, "y"), (3, "w")], [0, 1])
    assert a != DIGEST([(1, "x"), (1, "x"), (2, "y")], [0, 1])
    assert a != DIGEST(rows + [(3, "z")], [0, 1])


def test_digest_chunked_equals_whole():
    """The oracle side folds in 64k fetch chunks, the Spark side per
    partition — chunked accumulation must equal one-shot."""
    rows = [(i, i * 0.25) for i in range(1000)]
    whole = DIGEST(rows, [1, 0])
    n1, a1 = DIGEST(rows[:300], [1, 0])
    n2, a2 = DIGEST(rows[300:], [1, 0])
    assert (n1 + n2, (a1 + a2) & ((1 << 128) - 1)) == whole


def test_column_order_permutation_is_neutralized():
    """Engines may emit columns in different order; the digest aligns by
    the sorted-column-name permutation exactly like norm_rows."""
    # cols ('b','a') with order [1,0] == cols ('a','b') with order [0,1]
    assert DIGEST([(1, "x")], [1, 0]) == DIGEST([("x", 1)], [0, 1])


def test_huge_integral_bigint_vs_double_unify():
    """r8 advisor: BIGINT 10**15-and-up vs DOUBLE must still canon
    equal (Python == calls them equal; the old abs(r) < 1e15 guard
    split them into '1000000000000000' vs '1e+15')."""
    assert CANON(10**15) == CANON(1e15)
    assert CANON(10**18) == CANON(1e18)
    assert CANON(-(10**16)) == CANON(-1e16)
    # non-integral stays a float repr, ints stay exact
    assert CANON(1e15 + 0.5) != CANON(10**15)


def test_separator_bytes_cannot_shift_cell_boundaries():
    """r8 advisor: with join-based keys, ('a\\x1fsb','c') and
    ('a','b\\x1fsc') hashed identically; length-prefixed tokens keep
    distinct rows distinct whatever bytes the strings contain."""
    assert DIGEST([("a\x1fsb", "c")], [0, 1]) != DIGEST([("a", "b\x1fsc")], [0, 1])
    # list-element boundaries too (\x1e was the list joiner)
    assert CANON(["a\x1eb"]) != CANON(["a", "b"])
    assert DIGEST([(["x\x1f", "y"],)], [0]) != DIGEST([(["x", "\x1fy"],)], [0])
