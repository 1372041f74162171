"""Higher-order-function evaluation helpers.

Catalyst does no common-subexpression elimination inside HOF lambdas
(they are CodegenFallback, interpreted per element) — a plain Python
reference to an outer array expression is INLINED into the lambda body
and rebuilt per element. For an array built by a regex split or a byte
decomposition that turns O(n) work into O(n²) per row (measured: 14×
wall on 2-gram shingling, ~100× on d=1024 vector normalize).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def staged(expr: Column, build) -> Column:
    """Evaluate `expr` ONCE per row and pass its value to `build`.

    A HOF lambda VARIABLE is bound once — so route the value through a
    1-element transform and index it back out. Same values, same
    oracles; purely an evaluation-count fix. Use whenever a lambda body
    (or several sibling expressions) would otherwise re-evaluate a
    non-trivial array expression."""
    return F.transform(F.array(expr), build)[0]
