"""Table-map builders for CubeEngine over different physical sources."""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame, SparkSession

from ..model import Cube, Schema
from ..star import CubeEngine, read_parquet_table


def _table_names(cube: Cube) -> set[str]:
    names = {cube.fact}
    for d in cube.dimensions:
        if d.table:
            names.add(d.table)
            for link in d.joins:
                names.add(link.table)
    return names


def tables_from_parquet(spark: SparkSession, cube: Cube, data_dir: str) -> dict[str, DataFrame]:
    return {
        n: read_parquet_table(spark, f"{data_dir}/{n}.parquet") for n in _table_names(cube)
    }


def tables_from_catalog(
    spark: SparkSession, cube: Cube, mapping: Mapping[str, str] | None = None
) -> dict[str, DataFrame]:
    """Resolve logical table names through the Spark catalog — the path that
    picks up bucketed/managed tables (``spark.table`` sees bucket specs;
    plain file reads do not).  ``mapping`` overrides logical→catalog names."""
    mapping = dict(mapping or {})
    return {n: spark.table(mapping.get(n, n)) for n in _table_names(cube)}


def engine_from_catalog(
    spark: SparkSession,
    schema: Schema,
    cube_name: str,
    mapping: Mapping[str, str] | None = None,
) -> CubeEngine:
    cube = schema.cube(cube_name)
    return CubeEngine(cube, tables_from_catalog(spark, cube, mapping))


#: generic-form drivers (connection.rb:338-368 jdbc_uri_generic +
#: aliases): value = default_properties.  Like the reference, NO default
#: port — the port appears in the URI only when given (the JDBC driver
#: applies its own default).
_JDBC_GENERIC: dict[str, dict] = {
    "mysql": {"useUnicode": "true", "characterEncoding": "UTF-8"},
    "mariadb": {},
    "postgresql": {},
    "vertica": {},
}

#: sqlserver named-parameter → URI property mapping, in the reference's
#: emission order (connection.rb:386-392 JDBC_SQLSERVER_PARAM_PROPERTIES)
_SQLSERVER_PARAMS = (
    ("database", "databaseName"),
    ("integrated_security", "integratedSecurity"),
    ("application_name", "applicationName"),
    ("instance_name", "instanceName"),
    ("instance", "instanceName"),
)

#: snowflake mapping (connection.rb:411-415)
_SNOWFLAKE_PARAMS = (
    ("database", "db"),
    ("database_schema", "schema"),
    ("warehouse", "warehouse"),
)


def _props_string(
    properties: Mapping[str, str], separator: str, first_separator: str
) -> str:
    """``k=v`` pairs with URL-quoted values (a password containing ``&``
    or ``=`` must not corrupt the URI)."""
    from urllib.parse import quote

    if not properties:
        return ""
    body = separator.join(
        f"{k}={quote(str(v), safe='')}" for k, v in properties.items()
    )
    return first_separator + body


def jdbc_uri(
    driver: str,
    host: str | None = None,
    port: int | None = None,
    database: str | None = None,
    properties: Mapping[str, str] | None = None,
    **params,
) -> str:
    """Build the per-driver JDBC URI exactly like the reference's
    ``jdbc_uri_<driver>`` methods (connection.rb:313-457, pinned by
    test/connection_test.rb:100-126):

    * generic ``jdbc:<driver>://host[:port][/database][?k=v&…]`` for
      mysql/mariadb/postgresql/vertica — the port appears ONLY when
      given (the JDBC driver applies its own default);
    * Oracle thin: TNS-alias form ``jdbc:oracle:thin:@<database>`` when
      only a database is given and ``$TNS_ADMIN`` is set; explicit
      ``url=`` passes through; else host (default ``localhost``) + port
      (default 1521) + SID rule (a bare database name is a SID; one
      starting with ``/`` or ``:`` passes through as a service name);
    * SQL Server ``;``-separated properties, never a path database —
      named params ``database/integrated_security/application_name/
      instance_name/instance`` map to ``databaseName/integratedSecurity/
      applicationName/instanceName`` in the reference's order;
    * Snowflake ``/?db=…&schema=…&warehouse=…`` from
      ``database/database_schema/warehouse``;
    * ClickHouse ``jdbc:ch[:protocol]://`` (``protocol=`` validated as a
      word, like the reference);
    * ``driver='jdbc'`` returns the explicit ``jdbc_url=`` verbatim.

    Deviation (documented): property VALUES are URL-quoted here — the
    reference joins them raw, leaving escaping to the caller; a password
    containing ``&``/``;`` corrupts a raw URI.
    """
    props = dict(properties or {})

    def mapped(mapping) -> dict:
        out = {}
        if database is not None:
            params_all = {"database": database, **params}
        else:
            params_all = params
        for key, prop in mapping:
            if params_all.get(key) is not None:
                out.setdefault(prop, params_all[key])
        return out

    if driver == "jdbc":
        url = params.get("jdbc_url")
        if not url:
            raise ValueError("missing jdbc_url parameter")
        return url
    if driver == "oracle":
        import os

        if database and not host and not params.get("url") and os.environ.get("TNS_ADMIN"):
            return f"jdbc:oracle:thin:@{database}"
        if params.get("url"):
            return params["url"]
        db = database or ""
        if db and db[0] not in ":/":
            db = f":{db}"  # bare name = SID (reference back-compat rule)
        return f"jdbc:oracle:thin:@{host or 'localhost'}:{port or 1521}{db}"
    if driver == "sqlserver":
        uri = f"jdbc:sqlserver://{host}" + (f":{port}" if port else "")
        return uri + _props_string(mapped(_SQLSERVER_PARAMS) | props, ";", ";")
    if driver == "snowflake":
        uri = f"jdbc:snowflake://{host}" + (f":{port}" if port else "")
        return uri + _props_string(mapped(_SNOWFLAKE_PARAMS) | props, "&", "/?")
    if driver == "clickhouse":
        protocol = params.get("protocol")
        if protocol is not None:
            import re as _re

            if not _re.fullmatch(r"\w+", protocol):
                raise ValueError(f"invalid protocol {protocol}")
            prefix = f"jdbc:ch:{protocol}://"
        else:
            prefix = "jdbc:ch://"
        uri = f"{prefix}{host}" + (f":{port}" if port else "")
        if database:
            uri += f"/{database}"
        return uri + _props_string(props, "&", "?")
    try:
        default_props = _JDBC_GENERIC[driver]
    except KeyError:
        raise ValueError(
            f"unknown JDBC driver {driver!r} (known: "
            f"{sorted(_JDBC_GENERIC) + ['oracle', 'sqlserver', 'snowflake', 'clickhouse', 'jdbc']})"
        ) from None
    uri = f"jdbc:{driver}://{host}"
    if port:
        uri += f":{port}"
    if database:
        uri += f"/{database}"
    return uri + _props_string({**default_props, **props}, "&", "?")


def tables_from_jdbc(
    spark: SparkSession,
    cube: Cube,
    url: str,
    user: str | None = None,
    password: str | None = None,
    mapping: Mapping[str, str] | None = None,
    partition_options: Mapping[str, Mapping[str, str]] | None = None,
    reader=None,
    driver: str | None = None,
) -> dict[str, DataFrame]:
    """Register every cube table over ``spark.read.jdbc`` — the analog of
    the reference's JDBC connection layer (connection.rb:313-457), where
    every dialect collapses to one Spark reader.

    ``mapping`` overrides logical→database table names (schemas:
    ``{"lineitem": "tpch.lineitem"}``).  ``partition_options`` supplies
    per-table parallel-read options (``partitionColumn``/``lowerBound``/
    ``upperBound``/``numPartitions``) — REQUIRED for any large fact at
    scale: without them Spark reads the whole table through one JDBC
    connection.  ``reader`` injects a ``(table, options) -> DataFrame``
    for tests (no database in this environment); the default drives
    ``spark.read.format('jdbc')``."""
    mapping = dict(mapping or {})
    partition_options = {k: dict(v) for k, v in (partition_options or {}).items()}

    def default_reader(table: str, options: Mapping[str, str]) -> DataFrame:
        r = spark.read.format("jdbc").option("url", url).option("dbtable", table)
        if user is not None:
            r = r.option("user", user)
        if password is not None:
            r = r.option("password", password)
        if driver is not None:
            r = r.option("driver", driver)
        for k, v in options.items():
            r = r.option(k, v)
        return r.load()

    read = reader or default_reader
    return {
        n: read(mapping.get(n, n), partition_options.get(n, {}))
        for n in _table_names(cube)
    }


def engine_from_jdbc(
    spark: SparkSession,
    schema: Schema,
    cube_name: str,
    url: str,
    **kwargs,
) -> CubeEngine:
    cube = schema.cube(cube_name)
    return CubeEngine(cube, tables_from_jdbc(spark, cube, url, **kwargs))


def tables_from_files(
    spark: SparkSession,
    cube: Cube,
    data_dir: str,
    format: str = "parquet",
    mapping: Mapping[str, str] | None = None,
    options: Mapping[str, str] | None = None,
    schemas: Mapping[str, str] | None = None,
) -> dict[str, DataFrame]:
    """Register every cube table from ``<data_dir>/<table>.<ext>`` in any
    Spark file format — csv, json, orc, avro (if the package is on the
    classpath), text.  ``options`` pass through to the reader (csv wants
    ``header``/``inferSchema`` or better: explicit ``schemas`` per table —
    schema inference is a full extra pass over the data, the wrong default
    at scale).  ``mapping`` overrides logical→file names.

    Parquet/ORC keep the scan properties the engine's plans rely on
    (column pruning + predicate pushdown); CSV/JSON are row-oriented —
    fine as ingestion sources, wrong as the resident fact format at
    100 TB (convert once, query forever)."""
    mapping = dict(mapping or {})
    opts = dict(options or {})
    schemas = dict(schemas or {})
    out: dict[str, DataFrame] = {}
    for n in _table_names(cube):
        r = spark.read.format(format).options(**opts)
        if n in schemas:
            r = r.schema(schemas[n])
        out[n] = r.load(f"{data_dir}/{mapping.get(n, n)}.{format}")
    return out


def engine_from_files(
    spark: SparkSession, schema: Schema, cube_name: str, data_dir: str, **kwargs
) -> CubeEngine:
    cube = schema.cube(cube_name)
    return CubeEngine(cube, tables_from_files(spark, cube, data_dir, **kwargs))


def delta_available(spark: SparkSession) -> bool:
    """True when the delta-spark bindings and the Delta SQL extension are
    importable in this session (absent in this environment — the wrappers
    skip gracefully)."""
    try:
        import delta  # noqa: F401
    except ImportError:
        return False
    return True


def tables_from_delta(
    spark: SparkSession, cube: Cube, data_dir: str, mapping: Mapping[str, str] | None = None
) -> dict[str, DataFrame]:
    """Register every cube table from Delta Lake paths
    (``<data_dir>/<table>``).  Delta keeps the parquet scan properties the
    engine's plans rely on (pushdown, pruning, split sizing) and adds ACID
    upserts — the natural sink for streaming summary maintenance (MERGE
    INTO instead of union-rewrite).  Raises a clear error when delta-spark
    is not installed."""
    if not delta_available(spark):
        raise ImportError(
            "delta-spark is not installed in this environment; "
            "tables_from_delta needs the Delta Lake bindings "
            "(pip install delta-spark + spark.sql.extensions config)"
        )
    mapping = dict(mapping or {})
    return {
        n: spark.read.format("delta").load(f"{data_dir}/{mapping.get(n, n)}")
        for n in _table_names(cube)
    }


def engine_from_delta(
    spark: SparkSession, schema: Schema, cube_name: str, data_dir: str, **kwargs
) -> CubeEngine:
    cube = schema.cube(cube_name)
    return CubeEngine(cube, tables_from_delta(spark, cube, data_dir, **kwargs))


def with_sql_views(
    spark: SparkSession,
    tables: Mapping[str, DataFrame],
    views: Mapping[str, str],
) -> dict[str, DataFrame]:
    """View elements (schema.rb View/SQL — schema_definition_test.rb:171-193):
    logical tables defined by SQL text instead of a physical source.  The
    base ``tables`` register as temp views first so view SQL can reference
    them; each view then becomes a regular entry in the table map (Catalyst
    inlines it — predicate pushdown and pruning reach the underlying scans)."""
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    out = dict(tables)
    for alias, sql in views.items():
        out[alias] = spark.sql(sql)
    return out
