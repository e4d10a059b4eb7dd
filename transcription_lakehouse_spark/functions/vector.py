"""Vector expressions over ``array<float>`` embedding columns.

Cosine/dot/norm are built from Spark higher-order functions (``zip_with`` +
``aggregate``) so they run JVM-side inside whole-stage codegen — no Python in
the hot path. This replaces the reference's numpy kernels
(`/root/reference/src/lakehouse/quality/metrics/embedding.py:310-405`,
`aggregation/beats.py:198-217`).

Everything computes in double (arrays are cast first) with strict
left-to-right accumulation, which is the same evaluation order DuckDB's
``list_inner_product`` / ``list_cosine_similarity`` use — required for
hash-exact oracle parity.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

__all__ = [
    "as_double_array",
    "dot",
    "l2_norm",
    "cosine",
    "cosine_clipped",
    "guarded_cosine",
]


def as_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def guarded_cosine(
    a: Column, b: Column, a_norm: Column, b_norm: Column, digits: int = 6
) -> Column:
    """THE rounded guarded cosine every ANN/dedup/decontam rank path
    shares: ``round(when(an*bn > 0, dot(a,b)/(an*bn)).otherwise(0.0), d)``
    from PRECOMPUTED norms, default 6 digits. One definition on purpose —
    the DuckDB twins (`workload/vectors.py:_XY_COS`) replay this exact
    operand order, and graph/beam ranks can only match the other ANN
    paths' ranks if the arithmetic is literally the same expression."""
    den = a_norm * b_norm
    return F.round(
        F.when(den > 0, dot(a, b) / den).otherwise(F.lit(0.0)), digits
    )


def cosine(a: Column, b: Column) -> Column:
    """cosine similarity in [-1, 1]; 0 when either vector is all-zero."""
    num = dot(a, b)
    den = l2_norm(a) * l2_norm(b)
    return F.when(den > 0, num / den).otherwise(F.lit(0.0))


def cosine_clipped(a: Column, b: Column) -> Column:
    """Reference clips cosine to [0, 1] (`beats.py:216-217`)."""
    return F.greatest(F.lit(0.0), F.least(F.lit(1.0), cosine(a, b)))
