"""Vector column functions for embedding similarity (SURVEY.md §7 step 7).

All math is expressed with built-in higher-order array functions
(zip_with / aggregate / transform), evaluated JVM-side in index order —
bit-reproducible against the DuckDB oracle's list_transform/list_sum,
and codegen-friendly (no Python round-trip per row).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential double-precision dot product of two float arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def hyperplane_bit(a: Column, h: int) -> Column:
    """Sign bit of the projection of ``a`` onto a deterministic integer
    pseudo-random hyperplane: w[j] = ((h*31 + j*17) % 7) - 3 for
    0-based j. Integer weights make the projection reproducible in any
    engine (no libm, no RNG state).
    """
    proj = F.aggregate(
        F.transform(
            F.sequence(F.lit(1), F.size(a)),
            lambda i: F.element_at(a, i.cast("int")).cast("double")
            * (((F.lit(h * 31) + (i - 1) * 17) % 7) - 3).cast("double"),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return F.when(proj > 0, F.lit("1")).otherwise(F.lit("0"))


def lsh_bucket(a: Column, n_planes: int = 8) -> Column:
    """Random-hyperplane LSH bucket id: concatenated sign bits."""
    return F.concat(*[hyperplane_bit(a, h) for h in range(n_planes)])
