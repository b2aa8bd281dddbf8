"""Connection-string front-end for the relational loader
(reference ``database/loader/sql.py:18-48``): catalog reflection → FK/PK
metadata → read_relational.  SQLite exercises the live path; the JDBC
reflector's catalog parsing is shape-contract tested without a driver."""

import sqlite3

import pytest

from architxt_spark.sources.jdbc import Catalog, SqliteReflector, load_sql, reflector_for
from architxt_spark.sources.relational import FK


@pytest.fixture
def sqlite_db(tmp_path):
    path = str(tmp_path / "shop.db")
    conn = sqlite3.connect(path)
    conn.executescript(
        """
        CREATE TABLE region (r_id INTEGER PRIMARY KEY, r_name TEXT);
        CREATE TABLE nation (
            n_id INTEGER PRIMARY KEY, n_name TEXT,
            n_region INTEGER REFERENCES region(r_id)
        );
        INSERT INTO region VALUES (1, 'emea'), (2, 'apac');
        INSERT INTO nation VALUES (10, 'france', 1), (11, 'japan', 2), (12, 'china', 2);
        """
    )
    conn.commit()
    conn.close()
    return path


def test_sqlite_reflection(sqlite_db):
    cat = SqliteReflector(sqlite_db).reflect()
    assert cat.tables == ["nation", "region"]
    assert cat.pks == {"nation": ["n_id"], "region": ["r_id"]}
    assert cat.fks == [FK("nation", "n_region", "region", "r_id")]


def test_load_sql_matches_manual_metadata(spark, sqlite_db):
    """The connection-string path must produce the same forest as calling
    read_relational with hand-built tables + FK metadata."""
    from architxt_spark.sources.relational import read_relational

    auto = load_sql(spark, f"sqlite:///{sqlite_db}", namespace="db")

    refl = SqliteReflector(sqlite_db)
    tables = {t: refl.read_table(spark, t) for t in ["nation", "region"]}
    manual = read_relational(
        spark,
        tables,
        [FK("nation", "n_region", "region", "r_id")],
        {"nation": ["n_id"], "region": ["r_id"]},
        namespace="db",
    )
    a = {tuple(r) for r in auto.select("tree_id", "node_id", "node_type", "node_name", "leaf_value").collect()}
    b = {tuple(r) for r in manual.select("tree_id", "node_id", "node_type", "node_name", "leaf_value").collect()}
    assert a == b and len(a) > 0


def test_load_sql_forest_shape(spark, sqlite_db):
    nodes = load_sql(spark, f"sqlite:///{sqlite_db}")
    # 3 nation root rows, each tree: GROUP::nation + REL + GROUP::region
    assert nodes.select("tree_id").distinct().count() == 3
    names = [
        (r["node_type"], r["node_name"])
        for r in nodes.select("node_type", "node_name").distinct().collect()
    ]
    assert ("GROUP", "nation") in names
    assert ("GROUP", "region") in names
    assert ("REL", "nation<->region") in names


def test_reflector_dispatch():
    assert isinstance(reflector_for("sqlite:///tmp/x.db"), SqliteReflector)
    from architxt_spark.sources.jdbc import JdbcReflector

    r = reflector_for("jdbc:postgresql://host/db", jdbc_options={"numPartitions": "8"})
    assert isinstance(r, JdbcReflector)
    assert r.jdbc_options == {"numPartitions": "8"}


def test_jdbc_catalog_contract(spark):
    """The loader consumes any CatalogReflector; a fake standing in for
    DatabaseMetaData output proves the contract (no JDBC driver here)."""

    class Fake:
        def reflect(self):
            return Catalog(
                tables=["a", "b"],
                pks={"a": ["id"], "b": ["id"]},
                fks=[FK("a", "b_id", "b", "id")],
            )

        def read_table(self, spark, table):
            return spark.createDataFrame(
                [(1, 1)] if table == "a" else [(1, 0)],
                "id long, b_id long" if table == "a" else "id long, x long",
            )

    nodes = load_sql(spark, "jdbc:fake://x", reflector=Fake())
    assert nodes.count() > 0
