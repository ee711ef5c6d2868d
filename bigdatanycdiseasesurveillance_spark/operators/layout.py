"""Data-layout operators: Z-order (Morton) clustering keys and
range-clustered writes.

Why this exists at 100 TB: parquet min/max pruning only helps on the
column the file is sorted by. Sorting on a Z-value interleaving of two
dimensions bounds BOTH dimensions inside every file/range — a query
filtering on either column (or a box on both) prunes most files. This
is the layout trick behind Delta/Iceberg Z-ORDER OPTIMIZE, expressed
as plain columns + repartitionByRange so it works on any sink.

The Z-value itself is exact integer math: one `aggregate` fold over a
precomputed power-of-two array literal (shift amounts cannot be
columns in an expression, but the powers can be array elements), so it
stays inside whole-stage codegen and is bit-for-bit replayable in any
SQL engine with a list fold.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(x: Column, y: Column, bits: int = 10) -> Column:
    """Morton Z-interleave of two non-negative ints of `bits` bits each
    (x in the odd/high positions). Folds most-significant-bit first:
    acc = acc*4 + 2*bit_x + bit_y.
    """
    powers = F.array(*[F.lit(1 << i) for i in range(bits - 1, -1, -1)])
    xl, yl = x.cast("long"), y.cast("long")

    def bit(v: Column, p: Column) -> Column:
        return F.when(v.bitwiseAND(p) > 0, F.lit(1)).otherwise(F.lit(0))

    return F.aggregate(
        powers,
        F.lit(0).cast("long"),
        lambda acc, p: acc * 4 + bit(xl, p) * 2 + bit(yl, p),
    )


def zvalue_sql(x: str, y: str, bits: int = 10) -> str:
    """DuckDB replay of zvalue (list_reduce over the same powers)."""
    powers = ", ".join(str(1 << i) for i in range(bits - 1, -1, -1))
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), [{powers}]), "
        f"(acc, p) -> acc * 4"
        f" + 2 * (CASE WHEN ({x} & p) > 0 THEN 1 ELSE 0 END)"
        f" + (CASE WHEN ({y} & p) > 0 THEN 1 ELSE 0 END))"
    )


def zorder_layout(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 10,
    n_files: int = 32,
) -> DataFrame:
    """Cluster rows for writing: range-partition + sort by Z-value so
    each output file covers a compact rectangle of (x, y) — both
    columns get effective min/max pruning. One range shuffle (with the
    sampling pass range partitioning implies); the sort is per
    partition. Drop `zkey` after write if undesired.
    """
    z = zvalue(F.col(x_col), F.col(y_col), bits)
    return (
        df.withColumn("zkey", z)
        .repartitionByRange(n_files, "zkey")
        .sortWithinPartitions("zkey")
    )
