"""mondrian_olap_spark — a PySpark-native OLAP engine.

A from-scratch re-expression of the capabilities of rsim/mondrian-olap
(reference at /root/reference; a JRuby wrapper around the Mondrian ROLAP
engine) on idiomatic PySpark:

* the semantic model (cubes / dimensions / hierarchies / levels / measures /
  calculated members — reference ``lib/mondrian/olap/schema.rb``) is declared
  with Python dataclasses (:mod:`.model`);
* Mondrian's "generate SQL over JDBC" execution strategy becomes "build a
  DataFrame plan and let Catalyst execute it" (:mod:`.star`, :mod:`.plan`);
* the ActiveRecord-style query builder (``lib/mondrian/olap/query.rb``) is
  reproduced as a chainable :class:`.query.Query`;
* results surface as tidy DataFrames wrapped in a CellSet-style
  :class:`.result.Result` (``lib/mondrian/olap/result.rb``).

Nothing is ported from the reference implementation — the reference defines
*what* to compute; the *how* is Spark DataFrame / SQL throughout, so Catalyst
provides predicate pushdown, column pruning, broadcast star joins, grouping
sets, whole-stage codegen and AQE for free (SURVEY.md §4).
"""

from .model import (
    CalculatedMember,
    Cube,
    Dimension,
    JoinLink,
    Level,
    Measure,
    Schema,
)
from .pool import EnginePool, SchemaHandle
from .star import CubeEngine
from .query import Query, SetExpr
from .result import Result

__all__ = [
    "CalculatedMember",
    "Cube",
    "CubeEngine",
    "Dimension",
    "EnginePool",
    "JoinLink",
    "Level",
    "Measure",
    "Query",
    "Result",
    "Schema",
    "SchemaHandle",
    "SetExpr",
]

__version__ = "0.1.0"
