"""Data-layout keys: Z-order (Morton) interleaving for multi-dimensional
clustering.

Sorting a write by a single column gives later scans tight min/max
(row-group / file) pruning on that column only; filters on a second
column still read everything. Interleaving the bits of both columns into
one Morton key and sorting by it gives *both* columns locality — each
output file covers a small rectangle of (x, y) space, so parquet
min/max stats prune scans filtered on either column. This is the layout
trick behind Delta/Iceberg `ZORDER BY`, built here from plain bitwise
column expressions (JVM-side, codegen-friendly) and usable with
`sortWithinPartitions` / `repartitionByRange` on any Spark.

At 100 TB: one range-partitioned sort by the Morton key at write time;
every later query paying a two-column predicate reads only the files
whose (x, y) rectangle intersects it. The key is computed per row with
O(bits) bitwise ops — no shuffle beyond the write-time sort itself.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def scale_to_int(col: Column, lo: Column | float, hi: Column | float,
                 bits: int = 16) -> Column:
    """Affine-map a numeric column into [0, 2^bits - 1] integers."""
    lo_c = lo if isinstance(lo, Column) else F.lit(float(lo))
    hi_c = hi if isinstance(hi, Column) else F.lit(float(hi))
    span = hi_c - lo_c
    frac = F.when(span > 0, (col.cast("double") - lo_c) / span).otherwise(
        F.lit(0.0)
    )
    clamped = F.greatest(F.lit(0.0), F.least(F.lit(1.0), frac))
    return F.floor(clamped * ((1 << bits) - 1)).cast("long")


def zorder_key(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton key: interleave the low ``bits`` bits of two non-negative
    integer columns (x gets the odd positions, y the even)."""
    key = F.lit(0).cast("long")
    for i in range(bits):
        xbit = F.shiftright(x, i).bitwiseAND(F.lit(1))
        ybit = F.shiftright(y, i).bitwiseAND(F.lit(1))
        key = key.bitwiseOR(F.shiftleft(xbit, 2 * i + 1)).bitwiseOR(
            F.shiftleft(ybit, 2 * i)
        )
    return key
