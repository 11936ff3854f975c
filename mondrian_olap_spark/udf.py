"""User-defined function surface — the analog of the reference's Ruby→Java
UDF bridge (``lib/mondrian/olap/schema_udf.rb:64-213``; tests
``test/schema_definition_test.rb:900-1139``).

The reference lets schemas register typed MDX functions, cell formatters and
member formatters.  Here:

* :func:`register_scalar` wires a Python callable into Spark SQL (row UDF or
  Arrow-batched Pandas UDF) so any query expression — ``with_member``
  formulas, ``filter`` conditions, measure expressions — can call it by
  name.  UDFs are the documented slow path: everything built-in stays in
  codegen; Pandas UDFs are ~10-100× faster than row UDFs when Python is
  unavoidable.
* shared registry (``:shared`` UDFs, schema_udf.rb:17-31): register once per
  SparkSession, visible to every cube on it.
* cell formatters (schema_udf.rb:220-239) are plain Python callables applied
  driver-side in ``Result.formatted_values`` — never part of the plan.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import SparkSession

#: session-id → registered names (idempotence + introspection)
_REGISTERED: dict[str, set[str]] = {}


def register_scalar(
    spark: SparkSession,
    name: str,
    fn: Callable,
    returns: str = "double",
    vectorized: bool | None = None,
) -> None:
    """Register ``fn`` as SQL function ``name``.

    The Arrow-batched Pandas UDF path is the DEFAULT — the scale-safe
    choice (batched transfer, no per-row pickling):

    * ``vectorized=None`` (default): ``fn`` is an ordinary scalar callable
      (``fn(x, ...) -> value``); it is auto-wrapped to apply elementwise
      over Arrow-delivered ``pandas.Series`` batches.
    * ``vectorized=True``: ``fn`` is already Series-aware
      (``pandas.Series`` in/out) — registered directly, fully vectorized.
    * ``vectorized=False``: explicit opt-out to a row-at-a-time Python UDF
      (10-100× slower at scale; only for callables that can't tolerate
      Arrow type coercion).
    """
    from pyspark.sql import functions as F

    if vectorized is False:
        udf = F.udf(fn, returnType=returns)
    elif vectorized:
        udf = F.pandas_udf(fn, returnType=returns)
    else:
        udf = F.pandas_udf(_elementwise_over_batches(fn), returnType=returns)
    spark.udf.register(name, udf)
    _REGISTERED.setdefault(_session_key(spark), set()).add(name)


def _elementwise_over_batches(fn: Callable) -> Callable:
    """Lift a scalar callable to Series-in/Series-out so plain lambdas ride
    the Arrow batch path (saves the per-row serialization even though the
    Python call itself stays per-element).

    Missing values are delivered as Python ``None`` and numpy scalars as
    Python natives (``np.int64`` is NOT an ``int`` subclass), matching
    exactly what a row-at-a-time UDF would pass — otherwise an existing
    callable guarded by ``isinstance(x, int)`` or ``x is None`` silently
    misbehaves under the vectorized default."""
    import numpy as np
    import pandas as pd

    def _clean(v):
        if v is None:
            return None
        if isinstance(v, np.generic):
            v = v.item()
        try:
            if v != v:  # NaN/NaT
                return None
        except Exception:
            pass
        return v

    # NOTE: no type annotations here — pandas_udf would try to interpret
    # them as its typed-signature API and reject the variadic form
    def _batched(*cols):
        if len(cols) == 1:
            col = cols[0]
            return (
                col.astype(object)
                .where(col.notna(), None)
                .map(lambda v: fn(_clean(v)))
            )
        return pd.Series(
            [fn(*(_clean(v) for v in vals)) for vals in zip(*cols)]
        )

    return _batched


def registered_functions(spark: SparkSession) -> set[str]:
    return set(_REGISTERED.get(_session_key(spark), set()))


def _session_key(spark: SparkSession) -> str:
    return str(id(spark))


#: set-valued UDFs: name → callable(engine) -> list[member identifier]
#: (the ``call_with_evaluator`` surface, schema_udf.rb:120-180 — evaluated
#: at PLANNING time against the engine, like Mondrian evaluator access;
#: the returned identifiers resolve through the normal member machinery so
#: the set itself never leaves the plan)
_SET_VALUED: dict[str, Callable] = {}


def register_set_function(name: str, fn: Callable) -> None:
    """Register a set-valued UDF: ``fn(engine) -> list[str]`` of member
    identifiers.  Usable as a builder axis element
    (``.rows(set_function('name'))``) or called by name in MDX
    (``MySet() ON ROWS``)."""
    _SET_VALUED[name.lower()] = fn


def set_function(name: str) -> Callable | None:
    return _SET_VALUED.get(name.lower())
