"""Export-time type recovery (``export/sql.py:262-300`` parity)."""

import datetime

from architxt_spark.sinks import apply_typed_casts, infer_column_types


def _df(spark, col, values):
    return spark.createDataFrame([(v,) for v in values], f"{col} string")


def test_chain_precedence(spark):
    cases = {
        "d": (["2020-01-01", "1999-12-31"], "date"),
        "ts": (["2020-01-01 00:00:00", "2020-01-01T04:05:06"], "timestamp"),
        "b": (["true", "False"], "boolean"),
        "i": (["1", "-42", "+7"], "bigint"),
        "f": (["1.5", "2", "-0.25"], "double"),
        "s": (["1", "x"], "string"),
    }
    for col, (vals, want) in cases.items():
        got = infer_column_types(_df(spark, col, vals))[col]
        assert got == want, (col, got, want)


def test_strictness_mirrors_python_parse(spark):
    # date.fromisoformat rejects time parts -> timestamp, not date
    assert infer_column_types(_df(spark, "c", ["2020-01-01 10:00:00"]))["c"] == "timestamp"
    # int() rejects decimals -> double, not bigint
    assert infer_column_types(_df(spark, "c", ["1.0", "2"]))["c"] == "double"
    # bool beats int for pure true/false but '1'/'0' stay bigint
    assert infer_column_types(_df(spark, "c", ["1", "0"]))["c"] == "bigint"
    # invalid calendar date is not a date
    assert infer_column_types(_df(spark, "c", ["2020-13-45"]))["c"] == "string"


def test_nulls_and_apply(spark):
    df = spark.createDataFrame(
        [("2020-01-02", "3", None), (None, "4", None)],
        "d string, i string, z string",
    )
    types = infer_column_types(df)
    assert types == {"d": "date", "i": "bigint", "z": "string"}  # all-null -> string
    typed = apply_typed_casts(df, types)
    assert dict(typed.dtypes) == {"d": "date", "i": "bigint", "z": "string"}
    row = typed.orderBy("i").first()
    assert row["d"] == datetime.date(2020, 1, 2) and row["i"] == 3


def test_boolean_cast_values(spark):
    df = _df(spark, "b", ["true", "FALSE", None])
    typed = apply_typed_casts(df)
    vals = {r["b"] for r in typed.collect()}
    assert vals == {True, False, None}
