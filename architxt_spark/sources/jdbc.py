"""Live-database front-end for the relational loader
(``architxt/database/loader/sql.py:18-48`` — the reference reflects a live
RDBMS with SQLAlchemy ``MetaData.reflect``; here reflection produces the
:class:`~architxt_spark.sources.relational.FK` / PK metadata that
:func:`~architxt_spark.sources.relational.read_relational` already
consumes, and the bulk data rides ``spark.read.jdbc``).

Two reflection paths:

- :class:`JdbcReflector` — the cluster path: ``java.sql.DatabaseMetaData``
  (``getTables`` / ``getPrimaryKeys`` / ``getImportedKeys``) through py4j,
  which works for any database with a JDBC driver on the Spark classpath;
  table reads go through ``spark.read.jdbc`` so predicate pushdown and
  ``partitionColumn``-parallel scans apply.  No JDBC driver ships in this
  container, so this path is exercised by shape-contract tests.
- :class:`SqliteReflector` — a dependency-free path for ``sqlite:`` URLs
  (stdlib ``sqlite3`` + PRAGMA reflection); rows arrive via Arrow
  ``createDataFrame``.  SQLite files are single-machine by nature, so a
  driver-side read is the honest strategy; it doubles as the live test of
  the reflection→loader contract.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import TYPE_CHECKING, Mapping, Protocol

from architxt_spark.sources.relational import FK, read_relational

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession

__all__ = ["CatalogReflector", "JdbcReflector", "SqliteReflector", "load_sql"]


@dataclass(frozen=True)
class Catalog:
    """Reflected schema: table names, per-table PK columns, FK edges."""

    tables: list[str]
    pks: dict[str, list[str]]
    fks: list[FK]


class CatalogReflector(Protocol):
    def reflect(self) -> Catalog: ...

    def read_table(self, spark: SparkSession, table: str) -> DataFrame: ...


class JdbcReflector:
    """Catalog reflection over the standard ``java.sql.DatabaseMetaData``
    API — database-agnostic, same information SQLAlchemy's ``reflect``
    reads (``loader/sql.py:34-38``)."""

    def __init__(
        self,
        url: str,
        *,
        properties: Mapping[str, str] | None = None,
        jdbc_options: Mapping[str, str] | None = None,
    ) -> None:
        self.url = url
        self.properties = dict(properties or {})
        #: extra ``spark.read.jdbc`` options (``numPartitions``,
        #: ``partitionColumn``, ``fetchsize`` …) for parallel scans
        self.jdbc_options = dict(jdbc_options or {})
        self._spark: SparkSession | None = None

    def _metadata(self):
        from pyspark.sql import SparkSession

        spark = self._spark or SparkSession.getActiveSession()
        jvm = spark._sc._jvm  # noqa: SLF001 — public JDBC API via the session JVM
        props = jvm.java.util.Properties()
        for k, v in self.properties.items():
            props.setProperty(k, v)
        conn = jvm.java.sql.DriverManager.getConnection(self.url, props)
        return conn, conn.getMetaData()

    def reflect(self) -> Catalog:
        conn, meta = self._metadata()
        try:
            tables: list[str] = []
            rs = meta.getTables(None, None, "%", ["TABLE"])
            while rs.next():
                tables.append(rs.getString("TABLE_NAME"))
            pks: dict[str, list[str]] = {}
            fks: list[FK] = []
            for t in tables:
                prs = meta.getPrimaryKeys(None, None, t)
                cols: list[tuple[int, str]] = []
                while prs.next():
                    cols.append((prs.getInt("KEY_SEQ"), prs.getString("COLUMN_NAME")))
                pks[t] = [c for _, c in sorted(cols)]
                frs = meta.getImportedKeys(None, None, t)
                while frs.next():
                    fks.append(
                        FK(
                            table=t,
                            column=frs.getString("FKCOLUMN_NAME"),
                            ref_table=frs.getString("PKTABLE_NAME"),
                            ref_column=frs.getString("PKCOLUMN_NAME"),
                        )
                    )
            return Catalog(tables=sorted(tables), pks=pks, fks=sorted(fks, key=str))
        finally:
            conn.close()

    def read_table(self, spark: SparkSession, table: str) -> DataFrame:
        reader = spark.read.format("jdbc").option("url", self.url).option("dbtable", table)
        for k, v in {**self.properties, **self.jdbc_options}.items():
            reader = reader.option(k, v)
        return reader.load()


class SqliteReflector:
    """PRAGMA-based reflection + driver-side read for ``sqlite:`` URLs."""

    def __init__(self, path: str) -> None:
        self.path = path

    def _connect(self):
        import sqlite3

        return sqlite3.connect(self.path)

    def reflect(self) -> Catalog:
        with self._connect() as conn:
            tables = [
                r[0]
                for r in conn.execute(
                    "SELECT name FROM sqlite_master WHERE type='table' "
                    "AND name NOT LIKE 'sqlite_%' ORDER BY name"
                )
            ]
            pks: dict[str, list[str]] = {}
            fks: list[FK] = []
            for t in tables:
                info = list(conn.execute(f'PRAGMA table_info("{t}")'))
                # table_info: (cid, name, type, notnull, dflt_value, pk_seq)
                pks[t] = [r[1] for r in sorted(info, key=lambda r: r[5]) if r[5] > 0]
                for r in conn.execute(f'PRAGMA foreign_key_list("{t}")'):
                    # foreign_key_list: (id, seq, ref_table, from, to, …);
                    # a null `to` means the referenced table's PK
                    ref_col = r[4]
                    if ref_col is None:
                        ref_info = list(conn.execute(f'PRAGMA table_info("{r[2]}")'))
                        ref_pk = [x[1] for x in sorted(ref_info, key=lambda x: x[5]) if x[5] > 0]
                        ref_col = ref_pk[0] if ref_pk else None
                    fks.append(FK(table=t, column=r[3], ref_table=r[2], ref_column=ref_col))
        return Catalog(tables=tables, pks=pks, fks=sorted(fks, key=str))

    def read_table(self, spark: SparkSession, table: str) -> DataFrame:
        import pandas as pd

        with self._connect() as conn:
            pdf = pd.read_sql_query(f'SELECT * FROM "{table}"', conn)
        return spark.createDataFrame(pdf)


def reflector_for(url: str, **kwargs) -> CatalogReflector:
    """``sqlite:///path`` / ``sqlite:path`` → :class:`SqliteReflector`;
    anything else (``jdbc:…``) → :class:`JdbcReflector`."""
    if url.startswith("sqlite:"):
        path = url.removeprefix("sqlite://").removeprefix("sqlite:")
        return SqliteReflector(path)
    return JdbcReflector(url, **kwargs)


def load_sql(
    spark: SparkSession,
    url: str,
    *,
    reflector: CatalogReflector | None = None,
    properties: Mapping[str, str] | None = None,
    jdbc_options: Mapping[str, str] | None = None,
    namespace: str | None = None,
    search_all_instances: bool = False,
    sample: int = 0,
    max_depth: int = 10,
) -> DataFrame:
    """``read_sql`` from a connection string (``loader/sql.py:18-48``):
    reflect the catalog, read every table, and run the FK walk of
    :func:`read_relational` to produce the node table."""
    if reflector is None:
        kwargs = {}
        if not url.startswith("sqlite:"):
            kwargs = {"properties": properties, "jdbc_options": jdbc_options}
        reflector = reflector_for(url, **kwargs)
    catalog = reflector.reflect()
    tables = {t: reflector.read_table(spark, t) for t in catalog.tables}
    return read_relational(
        spark,
        tables,
        catalog.fks,
        catalog.pks,
        namespace=namespace or url,
        search_all_instances=search_all_instances,
        sample=sample,
        max_depth=max_depth,
    )
