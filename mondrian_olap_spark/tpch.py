"""Demo semantic model over the /root/testdata TPC-H-ish star schema.

FIXTURES.md §3 maps the reference's cube fixture
(``/root/reference/test/fixtures/MondrianTest.xml``) onto these tables:
``lineitem`` is the fact; customer geography is a *snowflake* dimension
(orders → customer → nation → region — exercising nested ``Join`` semantics,
schema.rb:169-174); time derives from ``o_orderdate`` with Time* level types;
return-flag / line-status are degenerate fact dimensions.

Scale notes: the orders-keyed dimensions (Customer, Time, …) are
high-cardinality — they join on ``l_orderkey`` via shuffle (sort-merge or
AQE-selected) and are deliberately *not* broadcast-hinted.  Region/nation
grain is bounded at any scale.  Part/supplier are left to Catalyst's
size-based broadcast + AQE.
"""

from __future__ import annotations

import threading

from pyspark.sql import SparkSession

from .model import Cube, Dimension, JoinLink, Level, Measure, CalculatedMember, Schema
from .star import CubeEngine, engine_from_parquet

SALES_CUBE = Cube(
    name="Sales",
    fact="lineitem",
    description="TPC-H lineitem sales cube",
    annotations=(("source", "tpch"),),
    dimensions=(
        # snowflake: orders → customer → nation → region (FIXTURES.md §3)
        Dimension(
            name="Customer",
            foreign_key="l_orderkey",
            table="orders",
            primary_key="o_orderkey",
            joins=(
                JoinLink("o_custkey", "customer", "c_custkey"),
                JoinLink("c_nationkey", "nation", "n_nationkey"),
                JoinLink("n_regionkey", "region", "r_regionkey"),
            ),
            levels=(
                Level("Region", "r_name", output="region_name"),
                Level("Nation", "n_name", output="nation_name"),
                Level("Customer", "c_name", output="customer_name"),
            ),
            # orders is only the bridge: customers without orders are still
            # members (model.members_from_join)
            members_from_join=0,
        ),
        # time dimension from the order date (TimeDimension — schema.rb:92-96)
        Dimension(
            name="Time",
            foreign_key="l_orderkey",
            table="orders",
            primary_key="o_orderkey",
            levels=(
                Level("Year", "year(o_orderdate)", output="o_year", level_type="TimeYears"),
                Level(
                    "Quarter",
                    "concat('Q', quarter(o_orderdate))",
                    output="o_quarter",
                    ordinal="quarter(o_orderdate)",
                    level_type="TimeQuarters",
                ),
                Level(
                    "Month",
                    "month(o_orderdate)",
                    output="o_month",
                    level_type="TimeMonths",
                ),
            ),
        ),
        # second hierarchy on the same time axis (Time.Weekly analog —
        # two-hierarchy example /root/reference/test/mondrian_test.rb:54-68)
        Dimension(
            name="TimeWeekly",
            foreign_key="l_orderkey",
            table="orders",
            primary_key="o_orderkey",
            levels=(
                Level("Year", "year(o_orderdate)", output="w_year", level_type="TimeYears"),
                Level("Week", "weekofyear(o_orderdate)", output="w_week", level_type="TimeWeeks"),
            ),
        ),
        Dimension(
            name="Priority",
            foreign_key="l_orderkey",
            table="orders",
            primary_key="o_orderkey",
            levels=(Level("Priority", "o_orderpriority", output="order_priority"),),
        ),
        Dimension(
            name="Segment",
            foreign_key="l_orderkey",
            table="orders",
            primary_key="o_orderkey",
            joins=(JoinLink("o_custkey", "customer", "c_custkey"),),
            levels=(Level("Segment", "c_mktsegment", output="mktsegment"),),
            members_from_join=0,
        ),
        Dimension(
            name="Part",
            foreign_key="l_partkey",
            table="part",
            primary_key="p_partkey",
            levels=(
                Level("Brand", "p_brand", output="brand"),
                Level(
                    "Part",
                    "p_name",
                    output="part_name",
                    # member properties (schema.rb:272-284; property test
                    # schema_definition_test.rb:777-818)
                    properties=(
                        ("part_size", "p_size"),
                        ("part_type_prop", "p_type"),
                        ("retail_price", "p_retailprice"),
                    ),
                ),
            ),
        ),
        Dimension(
            name="PartType",
            foreign_key="l_partkey",
            table="part",
            primary_key="p_partkey",
            levels=(Level("Type", "p_type", output="part_type"),),
        ),
        Dimension(
            name="Supplier",
            foreign_key="l_suppkey",
            table="supplier",
            primary_key="s_suppkey",
            joins=(JoinLink("s_nationkey", "nation", "n_nationkey"),),
            levels=(
                Level("Nation", "n_name", output="supplier_nation"),
                Level(
                    "Supplier",
                    "s_name",
                    output="supplier_name",
                    # display caption distinct from the key (schema.rb
                    # name/caption columns)
                    caption="concat(s_name, ' (', n_name, ')')",
                ),
            ),
            guaranteed_small=True,  # supplier table is tiny in this dataset
        ),
        # degenerate dimensions — level expressions over fact columns
        Dimension(
            name="ReturnFlag",
            levels=(Level("ReturnFlag", "l_returnflag", output="return_flag"),),
        ),
        Dimension(
            name="LineStatus",
            levels=(Level("LineStatus", "l_linestatus", output="line_status"),),
        ),
        Dimension(
            name="ShipTime",
            levels=(
                Level("Year", "year(l_shipdate)", output="ship_year", level_type="TimeYears"),
                Level("Month", "month(l_shipdate)", output="ship_month", level_type="TimeMonths"),
            ),
        ),
    ),
    measures=(
        # Money measures aggregate over exact DECIMAL expressions and cast
        # back to double at the cell edge (Measure.dtype) — decimal addition
        # is associative, so cell values are bit-identical across partition
        # counts, shuffle orders, and engines.  l_quantity is whole numbers
        # (< 2^53), already exact as double sums.
        Measure("Sum Qty", "l_quantity", "sum", output="sum_qty"),
        Measure(
            "Sum Price",
            "CAST(l_extendedprice AS DECIMAL(12,2))",
            "sum",
            output="sum_price",
            dtype="double",
        ),
        Measure(
            "Sum Disc Price",
            "CAST(l_extendedprice AS DECIMAL(12,2))"
            " * (CAST(1 AS DECIMAL(1,0)) - CAST(l_discount AS DECIMAL(3,2)))",
            "sum",
            output="sum_disc_price",
            dtype="double",
        ),
        Measure(
            "Sum Charge",
            "CAST(l_extendedprice AS DECIMAL(12,2))"
            " * (CAST(1 AS DECIMAL(1,0)) - CAST(l_discount AS DECIMAL(3,2)))"
            " * (CAST(1 AS DECIMAL(1,0)) + CAST(l_tax AS DECIMAL(3,2)))",
            "sum",
            output="sum_charge",
            dtype="double",
        ),
        Measure("Avg Qty", "l_quantity", "avg", output="avg_qty"),
        Measure(
            "Avg Price",
            "CAST(l_extendedprice AS DECIMAL(12,2))",
            "avg",
            output="avg_price",
            dtype="double",
        ),
        Measure(
            "Avg Disc",
            "CAST(l_discount AS DECIMAL(3,2))",
            "avg",
            output="avg_disc",
            dtype="double",
        ),
        Measure("Count Order", "l_orderkey", "count", output="count_order"),
        Measure("Distinct Parts", "l_partkey", "distinct-count", output="distinct_parts"),
        Measure(
            "Distinct Suppliers", "l_suppkey", "distinct-count", output="distinct_suppliers"
        ),
        Measure("Min Price", "l_extendedprice", "min", output="min_price"),
        Measure("Max Price", "l_extendedprice", "max", output="max_price"),
        # measure_expression with CASE (schema_definition_test.rb:527-550;
        # CASE WHEN — jar!...CaseTestFunDef, SURVEY.md §2.7)
        Measure(
            "High Disc Revenue",
            "CASE WHEN l_discount > 0.05 THEN CAST(l_extendedprice AS DECIMAL(12,2))"
            " ELSE CAST(0 AS DECIMAL(12,2)) END",
            "sum",
            output="high_disc_revenue",
            dtype="double",
        ),
        # CoalesceEmpty/NULLIF scalar composition inside a measure expression
        # (jar!...CoalesceEmptyFunDef; tests mondrian_test.rb:520-541)
        Measure(
            "Approx Parts",
            "l_partkey",
            "approx-distinct-count",
            output="approx_parts",
        ),
        Measure(
            "Nonzero Disc Count",
            "nullif(l_discount, 0.0)",
            "count",
            output="nonzero_disc_count",
        ),
    ),
    calculated_members=(
        # calc members over measure aliases, applied in solve_order
        # (schema.rb:314-341; MondrianTest.xml Profit members)
        CalculatedMember(
            "Discount Amount",
            "sum_price - sum_disc_price",
            output="discount_amount",
            solve_order=1,
        ),
        CalculatedMember(
            "Avg Item Value",
            "sum_price / count_order",
            output="avg_item_value",
            solve_order=1,
        ),
        CalculatedMember(
            "Discount Share",
            "discount_amount / sum_price",
            output="discount_share",
            solve_order=2,  # references an earlier calc member
        ),
    ),
)

# second fact cube over the orders table — conformed with Sales on the
# customer-geography and order-date dimensions (the Sales+Warehouse virtual
# cube analog, MondrianTest.xml:146-159 / FIXTURES.md §3)
ORDERS_CUBE = Cube(
    name="Orders",
    fact="orders",
    dimensions=(
        Dimension(
            name="Customer",
            foreign_key="o_custkey",
            table="customer",
            primary_key="c_custkey",
            joins=(
                JoinLink("c_nationkey", "nation", "n_nationkey"),
                JoinLink("n_regionkey", "region", "r_regionkey"),
            ),
            levels=(
                Level("Region", "r_name", output="region_name"),
                Level("Nation", "n_name", output="nation_name"),
                Level("Customer", "c_name", output="customer_name"),
            ),
        ),
        Dimension(
            name="Time",
            levels=(
                Level("Year", "year(o_orderdate)", output="o_year", level_type="TimeYears"),
                Level(
                    "Quarter",
                    "concat('Q', quarter(o_orderdate))",
                    output="o_quarter",
                    ordinal="quarter(o_orderdate)",
                    level_type="TimeQuarters",
                ),
                Level("Month", "month(o_orderdate)", output="o_month", level_type="TimeMonths"),
            ),
        ),
        Dimension(
            name="Priority",
            levels=(Level("Priority", "o_orderpriority", output="order_priority"),),
        ),
        Dimension(
            name="Status",
            levels=(Level("Status", "o_orderstatus", output="order_status"),),
        ),
    ),
    measures=(
        Measure(
            "Sum Total Price",
            "CAST(o_totalprice AS DECIMAL(12,2))",
            "sum",
            output="sum_totalprice",
            dtype="double",
        ),
        Measure("Order Count", "o_orderkey", "count", output="order_count"),
        Measure(
            "Avg Total Price",
            "CAST(o_totalprice AS DECIMAL(12,2))",
            "avg",
            output="avg_totalprice",
            dtype="double",
        ),
        Measure("Distinct Customers", "o_custkey", "distinct-count", output="distinct_customers"),
    ),
)

EVENTS_CUBE = Cube(
    name="Events",
    fact="events",
    dimensions=(
        Dimension(
            name="EventType",
            levels=(Level("EventType", "event_type", output="event_type"),),
        ),
        Dimension(
            name="EventTime",
            levels=(
                Level("Day", "day(ts)", output="event_day", level_type="TimeDays"),
            ),
        ),
    ),
    measures=(
        Measure(
            "Sum Value",
            "CAST(value AS DECIMAL(12,2))",
            "sum",
            output="sum_value",
            dtype="double",
        ),
        Measure("Event Count", "event_id", "count", output="event_count"),
        # Count(…, EXCLUDEEMPTY) semantics: count over an expression that is
        # NULL for empty cells counts only non-empty ones
        # (jar!mondrian/olap/fun/CountFunDef EXCLUDEEMPTY flag)
        Measure(
            "High Value Count",
            "IF(value > 50, value, NULL)",
            "count",
            output="high_value_count",
        ),
        Measure("Distinct Users", "user_id", "distinct-count", output="distinct_users"),
    ),
)

SCHEMA = Schema(name="TPCH", cubes=(SALES_CUBE, ORDERS_CUBE, EVENTS_CUBE))

_ENGINES: dict[tuple, CubeEngine] = {}
#: concurrent sessions share one engine per (session, sf_dir, cube) — the
#: reference's shared-schema connection pool (connection.rb:157-181); the
#: lock makes the check-then-build race yield ONE engine, not two engines
#: with independent caches
_ENGINES_LOCK = threading.Lock()


def get_engine(spark: SparkSession, sf_dir: str, cube: str = "Sales") -> CubeEngine:
    # keyed by session identity too: DataFrames bound to a stopped/replaced
    # SparkSession must not be served to a new one
    key = (id(spark), sf_dir, cube)
    eng = _ENGINES.get(key)
    if eng is not None:
        return eng
    with _ENGINES_LOCK:
        if key not in _ENGINES:
            eng = engine_from_parquet(spark, SCHEMA, cube, sf_dir)
            # Mondrian's default: the segment cache is ON — a warm repeat
            # query does 0 SQL until flushed (test/query_test.rb:1162-1213).
            # The aggregate cache is the Spark analog; role switches flush
            # it and with_role clones drop it, so sharing the engine is
            # safe.
            eng.enable_cache()
            _ENGINES[key] = eng
    return _ENGINES[key]


#: per-(session, sf_dir) partitioned-layout engines — writing the layout
#: costs a fact pass, so it happens once per session like `_ENGINES`
_PART_ENGINES: dict = {}


def partitioned_fact_engines(spark: SparkSession, sf_dir: str):
    """The DATE-PARTITIONED fact layout — the single biggest scan lever on
    a 100 TB fact (Hive-style ``o_year=`` directories; reference behavior
    anchor: slicer→WHERE pushdown, /root/reference/README.md:132-143).

    Materializes ``lineitem ⋈ orders`` once per session under a temp dir
    in TWO layouts with identical rows — partitioned by order year and
    flat — plus a small year-dimension table, and returns
    ``(partitioned_engine, flat_engine)`` over the same cube:

    * ``Time`` — degenerate on the fact (year = the PARTITION column,
      quarter derived): a time slicer must reach the scan as a STATIC
      ``PartitionFilters`` entry, pruning whole directories;
    * ``Epoch`` — a table dimension JOINED ON the partition column whose
      levels are non-key attributes: filtering it exercises DYNAMIC
      partition pruning (Spark plans a ``dynamicpruningexpression``
      subquery from the dim side — the classic filtered-date-dim star
      shape);
    * ``ReturnFlag`` — degenerate, for grouping.

    The flat engine answers must be bit-identical — layout is physical,
    never semantic.
    """
    key = (id(spark), sf_dir)
    eng = _PART_ENGINES.get(key)
    if eng is not None:
        return eng
    with _ENGINES_LOCK:
        if key in _PART_ENGINES:
            return _PART_ENGINES[key]
        import atexit
        import shutil
        import tempfile

        from pyspark.sql import functions as F

        from .star import read_parquet_table

        li = read_parquet_table(spark, f"{sf_dir}/lineitem.parquet")
        od = read_parquet_table(spark, f"{sf_dir}/orders.parquet")
        fact = (
            li.join(od, li["l_orderkey"] == od["o_orderkey"])
            .select(
                "l_quantity", "l_extendedprice", "l_returnflag",
                "o_orderdate", F.year("o_orderdate").alias("o_year"),
            )
        )
        work = tempfile.mkdtemp(prefix="partfact_")
        # two fact copies live here for the session — reclaim them at
        # process exit (repeated sessions would otherwise accumulate)
        atexit.register(shutil.rmtree, work, ignore_errors=True)
        fact.write.partitionBy("o_year").parquet(f"{work}/fact_part")
        fact.write.parquet(f"{work}/fact_flat")
        (
            fact.select("o_year").distinct()
            .select(
                "o_year",
                F.concat(
                    F.lit("EPOCH_"), (F.col("o_year") % 2).cast("string")
                ).alias("epoch"),
                F.concat(
                    F.lit("Y"), F.col("o_year").cast("string")
                ).alias("ylabel"),
            )
            .write.parquet(f"{work}/years")
        )
        cube = Cube(
            name="PartSales",
            fact="fact",
            dimensions=(
                Dimension(
                    name="Time",
                    levels=(
                        Level(
                            "Year", "o_year", output="t_year",
                            level_type="TimeYears",
                        ),
                        Level(
                            "Quarter",
                            "concat('Q', quarter(o_orderdate))",
                            output="t_quarter",
                            level_type="TimeQuarters",
                        ),
                    ),
                ),
                Dimension(
                    name="Epoch",
                    foreign_key="o_year",
                    table="years",
                    primary_key="o_year",
                    levels=(
                        Level("Epoch", "epoch", output="t_epoch"),
                        Level("YLabel", "ylabel", output="t_ylabel"),
                    ),
                ),
                Dimension(
                    name="ReturnFlag",
                    levels=(Level("Flag", "l_returnflag", output="flag"),),
                ),
            ),
            measures=(
                Measure("Sum Qty", "l_quantity", "sum", output="sum_qty"),
            ),
        )
        years = read_parquet_table(spark, f"{work}/years")
        part_eng = CubeEngine(
            cube,
            {
                "fact": read_parquet_table(spark, f"{work}/fact_part"),
                "years": years,
            },
        )
        flat_eng = CubeEngine(
            cube,
            {
                "fact": read_parquet_table(spark, f"{work}/fact_flat"),
                "years": years,
            },
        )
        _PART_ENGINES[key] = (part_eng, flat_eng)
    return _PART_ENGINES[key]
