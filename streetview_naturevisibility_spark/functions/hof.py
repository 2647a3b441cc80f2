"""Higher-order-function helpers.

``let_col`` is the engine's "let binding" for Column expressions:
Catalyst's projection collapse inlines an aliased computed column into
EVERY expression that references it, and HOF lambda bodies re-evaluate
non-lambda subexpressions per element — there is no common-
subexpression elimination across higher-order functions. Any EXPENSIVE
computed array (e.g. per-token md5 hashes) referenced k times (k
per-bit aggregates, per-window slices, a size() guard) is therefore
recomputed k times. Binding it as a lambda VARIABLE evaluates it once:
lambda variables are values, not expressions.

Measured on the MinHash signature stage (32 references): 16 s -> 7 s
at sf0.1 in the same host window; the SimHash 60-bit path (61
references) and the rolling fingerprint (n_windows+1 references) have
the same shape.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def let_col(bound: Column, body) -> Column:
    """Evaluate ``bound`` ONCE and pass the value into ``body`` as a
    lambda variable: ``element_at(transform(array(bound), body), 1)``.
    ``body`` is a 1-arg callable receiving the bound value Column;
    its result (scalar or array) is the expression value."""
    return F.element_at(F.transform(F.array(bound), body), 1)
