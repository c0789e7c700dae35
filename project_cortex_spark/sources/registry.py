"""Table registry: the engine's analogue of the reference's schema registry.

The reference validates every DSL query against a static table->columns map
(/root/reference/internal/files/schema.go:28-179) so that only known
identifiers reach SQL. Here the registry is dynamic: it loads parquet
tables, remembers their DataFrames, and exposes the same validation
surface against the live ``df.schema`` — stronger than a static map
because it can never drift from the data.

Scale notes: each table is a plain ``spark.read.parquet`` scan, so
Catalyst's predicate pushdown / column pruning / partition pruning apply
to everything compiled on top. Nothing is cached eagerly; at 100 TB the
registry is just a name->path catalog and the optimizer sees the raw
files.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# The driver-generated synthetic tables (TESTDATA.md).
DEFAULT_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _nano_timestamp_columns(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS), which Spark cannot map
    to TimestampType natively (read as long via
    ``spark.sql.legacy.parquet.nanosAsLong``)."""
    try:
        import os

        import pyarrow.parquet as pq
        import pyarrow.types as pat

        probe = path
        if os.path.isdir(path):
            # pq.read_schema raises on a directory; probe the first part
            # file's footer instead — all parts share one schema, and the
            # old except-Exception fallback silently skipped the
            # nanosAsLong conf for directory-layout NANOS tables
            parts = sorted(
                os.path.join(root, n)
                for root, _dirs, names in os.walk(path)
                for n in names
                if n.endswith(".parquet") and not n.startswith((".", "_"))
            )
            if not parts:
                return []
            probe = parts[0]
        schema = pq.read_schema(probe)
        return [
            f.name
            for f in schema
            if pat.is_timestamp(f.type) and f.type.unit == "ns"
        ]
    except Exception:
        return []


def _ensure_conf(spark: SparkSession, key: str, value: str) -> None:
    """Set a session conf only if it differs — a write (even of the same
    value) can churn derived session state, and this runs per table read."""
    try:
        current = spark.conf.get(key)
    except Exception:
        current = None
    if current != value:
        spark.conf.set(key, value)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan that restores TIMESTAMP(NANOS) columns to TimestampType.

    Uses integer division to micros (``x div 1000``) — lossless for the
    timestamp range and stays JVM-side, so pushdown/pruning on the scan
    are unaffected for every other column.

    **Session contract (loud, on purpose):** the engine requires a UTC
    session — every oracle compares epoch micros of naive parquet
    timestamps, which a non-UTC ``spark.sql.session.timeZone`` would
    shift. This function therefore SETS the session timezone to UTC
    (mutating the caller's session) and emits a ``UserWarning`` if it had
    to overwrite a different value, so callers who deliberately set their
    own timezone see the change instead of silently altered timestamp
    formatting/window bucketing. Callers needing a non-UTC timezone must
    scope it around (not across) engine reads.
    """
    from pyspark.sql import functions as F

    # defensive: a caller-supplied session (the driver harness) may not
    # carry these confs; naive parquet timestamps must land as TimestampType
    # in a UTC session — TIMESTAMP_NTZ breaks unix_micros, and a non-UTC
    # session timezone shifts the epoch micros the oracles compare against
    _ensure_conf(spark, "spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    try:
        prior_tz = spark.conf.get("spark.sql.session.timeZone")
    except Exception:
        prior_tz = None
    if prior_tz not in (None, "UTC", "Etc/UTC", "GMT"):
        import warnings

        warnings.warn(
            f"read_parquet: overwriting session timeZone {prior_tz!r} with "
            "'UTC' (engine contract — naive timestamps compare as epoch "
            "micros); scope non-UTC timezones around engine reads",
            UserWarning,
            stacklevel=2,
        )
    _ensure_conf(spark, "spark.sql.session.timeZone", "UTC")
    nano_cols = _nano_timestamp_columns(path)
    if nano_cols:
        # same defensive posture for TIMESTAMP(NANOS) testdata
        _ensure_conf(spark, "spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    # pyspark 4.1.2 reads TIMESTAMP(NANOS) natively as TimestampType
    # (micros truncation) and ignores nanosAsLong — the div-1000 restore
    # must only run when the column actually materialized as LONG
    # (older Spark under the legacy conf), else it is an AnalysisException
    dtypes = dict(df.dtypes)
    for c in nano_cols:
        if dtypes.get(c) == "bigint":
            df = df.withColumn(c, F.expr(f"timestamp_micros({c} div 1000)"))
    return df


class TableRegistry:
    """Name -> DataFrame catalog with identifier validation."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._tables: dict[str, DataFrame] = {}

    # -- registration ------------------------------------------------------
    def register(self, name: str, df: DataFrame) -> None:
        self._tables[name] = df
        df.createOrReplaceTempView(name)

    def register_parquet(self, name: str, path: str) -> None:
        self.register(name, read_parquet(self.spark, path))

    def load_dir(self, sf_dir: str, tables: tuple[str, ...] = DEFAULT_TABLES) -> None:
        for t in tables:
            path = os.path.join(sf_dir, f"{t}.parquet")
            if os.path.exists(path):
                self.register_parquet(t, path)

    # -- lookup / validation ----------------------------------------------
    def table(self, name: str) -> DataFrame:
        if name not in self._tables:
            raise KeyError(f"unknown table: {name!r} (known: {sorted(self._tables)})")
        return self._tables[name]

    def __contains__(self, name: str) -> bool:
        return name in self._tables

    def tables(self) -> list[str]:
        return sorted(self._tables)

    def columns(self, name: str) -> list[str]:
        return self.table(name).columns


def load_tables(spark: SparkSession, sf_dir: str) -> TableRegistry:
    reg = TableRegistry(spark)
    reg.load_dir(sf_dir)
    return reg
