"""Higher-order-function helpers.

Spark evaluates lambda bodies of ``transform``/``aggregate``/``filter``
interpreted, with NO common-subexpression elimination: an outer
expression referenced inside the lambda is re-evaluated on every
element, once per reference. Referencing a *bound variable* (a column
attribute or another lambda's argument) is O(1). ``let`` turns the
former into the latter without needing an extra projection (which
``CollapseProject`` could undo for cheap/single-use aliases anyway):

    let(expensive_expr, lambda v: <body using v>)

evaluates ``expensive_expr`` exactly once per row and binds it as a
lambda variable visible to any nested higher-order functions in the
body. Implemented as a 1-element ``transform``:
``element_at(transform(array(value), body), 1)``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def let(value: Column, body: Callable[[Column], Column]) -> Column:
    """Bind ``value`` once per row; return ``body(bound_value)``."""
    return F.element_at(F.transform(F.array(value), body), 1)
