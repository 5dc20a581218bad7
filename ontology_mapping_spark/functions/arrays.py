"""Array-expression helpers shared by the Catalyst-side operators.

:func:`bind` is the engine's standard defense against the two
higher-order-function re-evaluation traps (see BENCH.md "HOF CSE
pitfalls"): a lambda body that references an outer *expression* — or an
aliased column that Catalyst's CollapseProject inlines back into an
expression — is re-evaluated once per array element. Binding turns the
expression into a NamedLambdaVariable, evaluated exactly once per row and
immune to projection collapse.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def bind(expr: Column, fn) -> Column:
    """Evaluate ``expr`` exactly once per row and pass it to ``fn`` as a
    lambda-bound variable (wrap in a one-element array, map, take [0]).

    NB: ``fn`` must be a ONE-parameter callable — F.transform reads a
    two-parameter function (even with defaults) as (element, index).
    """
    return F.transform(F.array(expr), fn)[0]
