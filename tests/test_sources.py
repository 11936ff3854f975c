"""JDBC / Delta source wrappers (connection.rb:313-457 parity).

The JDBC path is tested LIVE against embedded Derby (Spark ships the
driver jars) — full engine over a real database — plus option-plumbing
tests through the injected-reader seam.  Delta tests assert the
graceful-skip contract (delta-spark absent here) with a conditional live
path.
"""

import pytest

from mondrian_olap_spark.sources import registry
from mondrian_olap_spark.star import read_parquet_table
from mondrian_olap_spark.tpch import SCHEMA

from .conftest import SF_DIR


def test_jdbc_uri_generic_and_driver_shapes():
    """URI shapes mirror the reference's jdbc_uri_<driver> family — like
    the reference, generic drivers emit a port ONLY when one is given."""
    assert (
        registry.jdbc_uri("postgresql", "db.example", database="tpch")
        == "jdbc:postgresql://db.example/tpch"
    )
    assert (
        registry.jdbc_uri("postgresql", "db.example", port=5433, database="t")
        == "jdbc:postgresql://db.example:5433/t"
    )
    # mysql adds its default properties (connection.rb jdbc_uri_mysql)
    uri = registry.jdbc_uri("mysql", "h", port=3307, database="d")
    assert uri.startswith("jdbc:mysql://h:3307/d?")
    assert "useUnicode=true" in uri and "characterEncoding=UTF-8" in uri
    # explicit properties merge over defaults
    uri2 = registry.jdbc_uri(
        "mysql", "h", database="d", properties={"useUnicode": "false"}
    )
    assert "useUnicode=false" in uri2
    # oracle thin SID form (bare database = SID, connection.rb:370-384)
    assert registry.jdbc_uri("oracle", "h", database="XE") == (
        "jdbc:oracle:thin:@h:1521:XE"
    )
    assert registry.jdbc_uri("oracle", "h", database="/service") == (
        "jdbc:oracle:thin:@h:1521/service"
    )
    # oracle host defaults to localhost; explicit url passes through
    assert registry.jdbc_uri("oracle", database="XE") == (
        "jdbc:oracle:thin:@localhost:1521:XE"
    )
    assert registry.jdbc_uri("oracle", url="jdbc:oracle:thin:@x") == (
        "jdbc:oracle:thin:@x"
    )
    # Snowflake: /?db=…&…  (connection.rb jdbc_uri_snowflake)
    assert registry.jdbc_uri(
        "snowflake", "acct.snowflakecomputing.com", database="d"
    ) == "jdbc:snowflake://acct.snowflakecomputing.com/?db=d"
    assert registry.jdbc_uri(
        "snowflake", "a", database="d", database_schema="s", warehouse="w"
    ) == "jdbc:snowflake://a/?db=d&schema=s&warehouse=w"
    # ClickHouse prefix is jdbc:ch:// — port only when given; protocol
    # variant is validated (connection.rb jdbc_uri_clickhouse)
    assert registry.jdbc_uri("clickhouse", "h", database="d") == (
        "jdbc:ch://h/d"
    )
    assert registry.jdbc_uri(
        "clickhouse", "h", port=8443, database="d", protocol="https"
    ) == "jdbc:ch:https://h:8443/d"
    with pytest.raises(ValueError, match="invalid protocol"):
        registry.jdbc_uri("clickhouse", "h", protocol="no/pe")
    # explicit 'jdbc' driver passes the url through (jdbc_uri_jdbc)
    assert registry.jdbc_uri("jdbc", jdbc_url="jdbc:foo:bar") == "jdbc:foo:bar"
    with pytest.raises(ValueError, match="missing jdbc_url"):
        registry.jdbc_uri("jdbc")
    # property values URL-quote (a password with & must not split the URI;
    # documented deviation — the reference joins values raw)
    assert "p%26q" in registry.jdbc_uri(
        "postgresql", "h", database="d", properties={"password": "p&q"}
    )
    with pytest.raises(ValueError, match="unknown JDBC driver"):
        registry.jdbc_uri("nosuchdb", "h")


def test_jdbc_uri_sqlserver_reference_pinned():
    """The three SQL Server URI specs from test/connection_test.rb:104-126,
    byte-for-byte."""
    assert registry.jdbc_uri(
        "sqlserver", "example.com", port=1234,
        instance="MSSQLSERVER", database="example_db",
    ) == ("jdbc:sqlserver://example.com:1234;databaseName=example_db;"
          "instanceName=MSSQLSERVER")
    assert registry.jdbc_uri(
        "sqlserver", "example.com", properties={"instanceName": "MSSQLSERVER"}
    ) == "jdbc:sqlserver://example.com;instanceName=MSSQLSERVER"
    assert registry.jdbc_uri(
        "sqlserver", "example.com", integrated_security="true"
    ) == "jdbc:sqlserver://example.com;integratedSecurity=true"
    # instance_name synonym + application_name, reference emission order
    assert registry.jdbc_uri(
        "sqlserver", "h", database="d", application_name="app",
        instance_name="i",
    ) == "jdbc:sqlserver://h;databaseName=d;applicationName=app;instanceName=i"


def test_tables_from_jdbc_plumbing(spark):
    """Every cube table resolves through the reader with its mapped name
    and per-table partition options."""
    cube = SCHEMA.cube("Sales")
    seen = {}

    def fake_reader(table, options):
        seen[table] = dict(options)
        logical = table.split(".")[-1]
        return read_parquet_table(spark, f"{SF_DIR}/{logical}.parquet")

    tables = registry.tables_from_jdbc(
        spark,
        cube,
        url="jdbc:postgresql://db:5432/tpch",
        mapping={"lineitem": "tpch.lineitem"},
        partition_options={
            "lineitem": {
                "partitionColumn": "l_orderkey",
                "lowerBound": "1",
                "upperBound": "6000000",
                "numPartitions": "32",
            }
        },
        reader=fake_reader,
    )
    assert "tpch.lineitem" in seen  # mapping applied
    assert seen["tpch.lineitem"]["numPartitions"] == "32"  # parallel read
    assert all(v == {} for k, v in seen.items() if k != "tpch.lineitem")
    assert set(tables) == {
        "lineitem", "orders", "customer", "nation", "region",
        "supplier", "part",
    }


def test_engine_from_jdbc_end_to_end(spark):
    """A cube over the JDBC-shaped registry answers queries identically to
    the parquet path (the reader seam feeds the same data)."""
    import mondrian_olap_spark as mos

    def fake_reader(table, options):
        return read_parquet_table(spark, f"{SF_DIR}/{table}.parquet")

    eng = registry.engine_from_jdbc(
        spark, SCHEMA, "Sales", url="jdbc:postgresql://db/x", reader=fake_reader
    )
    r = (
        mos.Query(eng)
        .columns("[Measures].[Sum Qty]")
        .rows("[Customer].children")
        .where("[Time].[1995].[Q1]")
        .execute()
    )
    vals = {x["region_name"]: x["sum_qty"] for x in r.df.collect()}
    assert vals["AFRICA"] == 1432.0 and len(vals) == 5


def test_delta_unavailable_contract(spark):
    """Without delta-spark, availability reports False and the wrapper
    raises the documented ImportError (not an opaque Py4J failure)."""
    if registry.delta_available(spark):
        pytest.skip("delta-spark installed — covered by the live path")
    cube = SCHEMA.cube("Sales")
    with pytest.raises(ImportError, match="delta-spark"):
        registry.tables_from_delta(spark, cube, "/tmp/delta")


@pytest.mark.skipif(
    not __import__("importlib").util.find_spec("delta"),
    reason="delta-spark not installed",
)
def test_delta_live_path(spark, tmp_path):
    cube = SCHEMA.cube("Sales")
    for n in ("region",):
        read_parquet_table(spark, f"{SF_DIR}/{n}.parquet").write.format(
            "delta"
        ).save(str(tmp_path / n))
    tables = registry.tables_from_delta(spark, cube, str(tmp_path))
    assert tables["region"].count() == 5


DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def test_jdbc_live_derby_end_to_end(spark, tmp_path):
    """LIVE JDBC path: Spark ships embedded Derby, so the wrapper is
    exercised against a real database — every cube table written to Derby
    via df.write.jdbc, read back through engine_from_jdbc, and the
    flagship query answers identically to the parquet engine."""
    import mondrian_olap_spark as mos
    from py4j.protocol import Py4JJavaError

    url = f"jdbc:derby:{tmp_path}/derbydb;create=true"
    props = {"driver": DERBY_DRIVER}
    try:
        for t in ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem"):
            read_parquet_table(spark, f"{SF_DIR}/{t}.parquet").write.jdbc(
                url, t, properties=props
            )
    except Py4JJavaError as e:  # pragma: no cover - driver jar missing
        pytest.skip(f"embedded Derby unavailable: {str(e)[:80]}")
    eng = registry.engine_from_jdbc(
        spark, SCHEMA, "Sales", url=url, driver=DERBY_DRIVER
    )
    r = (
        mos.Query(eng)
        .columns("[Measures].[Sum Qty]")
        .rows("[Customer].children")
        .where("[Time].[1995].[Q1]")
        .execute()
    )
    vals = {x["region_name"]: x["sum_qty"] for x in r.df.collect()}
    assert vals["AFRICA"] == 1432.0 and len(vals) == 5
    # parallel-read options reach the real reader too
    tables = registry.tables_from_jdbc(
        spark, SCHEMA.cube("Sales"), url=url, driver=DERBY_DRIVER,
        partition_options={
            "lineitem": {
                "partitionColumn": "l_orderkey",
                "lowerBound": "1",
                "upperBound": "60000",
                "numPartitions": "4",
            }
        },
    )
    assert tables["lineitem"].rdd.getNumPartitions() == 4


@pytest.mark.parametrize("fmt", ["csv", "json", "orc"])
def test_engine_from_files_formats(spark, tmp_path, fmt):
    """CSV/JSON/ORC sources: every cube table converted to the format,
    registered via tables_from_files, flagship query identical to the
    parquet engine (CSV with explicit schemas — inference is the wrong
    default at scale)."""
    import mondrian_olap_spark as mos

    d = tmp_path / fmt
    schemas = {}
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"):
        df = read_parquet_table(spark, f"{SF_DIR}/{t}.parquet")
        df.write.format(fmt).options(
            **({"header": "true"} if fmt == "csv" else {})
        ).save(str(d / f"{t}.{fmt}"))
        schemas[t] = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                               for f in df.schema.fields)
    eng = registry.engine_from_files(
        spark, SCHEMA, "Sales", str(d), format=fmt,
        options={"header": "true"} if fmt == "csv" else {},
        schemas=schemas if fmt in ("csv", "json") else {},
    )
    r = (
        mos.Query(eng)
        .columns("[Measures].[Sum Qty]")
        .rows("[Customer].children")
        .where("[Time].[1995].[Q1]")
        .execute()
    )
    vals = {x["region_name"]: x["sum_qty"] for x in r.df.collect()}
    assert vals["AFRICA"] == 1432.0 and len(vals) == 5
