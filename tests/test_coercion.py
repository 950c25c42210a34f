"""Type-coercion tests covering every branch of
/root/reference/db/operations.go:150-193 (the reference only tests the
bool branch, db/operations_test.go:10-41)."""

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from substreams_sink_clickhouse_spark.functions.coercion import coerce


def _one(spark, value, dtype):
    df = spark.createDataFrame([(value,)], "v string")
    return df.select(coerce(F.col("v"), dtype).alias("out")).collect()[0]["out"]


def test_string_passthrough(spark):
    assert _one(spark, "it's a string", T.StringType()) == "it's a string"


def test_bool_true_false(spark):
    assert _one(spark, "true", T.BooleanType()) is True
    assert _one(spark, "TRUE", T.BooleanType()) is True
    assert _one(spark, "false", T.BooleanType()) is False


def test_integers(spark):
    assert _one(spark, "42", T.IntegerType()) == 42
    assert _one(spark, "-7", T.LongType()) == -7
    assert _one(spark, "255", T.ShortType()) == 255


def test_floats(spark):
    assert _one(spark, "3.5", T.DoubleType()) == 3.5
    assert _one(spark, "1.0E7", T.DoubleType()) == 1.0e7


def test_unix_seconds_timestamp(spark):
    # All-digits string -> Unix seconds (db/operations.go:167-180)
    out = _one(spark, "1700000000", T.TimestampType())
    assert out == datetime.datetime(2023, 11, 14, 22, 13, 20)


def test_plain_timestamp_string(spark):
    out = _one(spark, "2024-03-01 12:30:00", T.TimestampType())
    assert out == datetime.datetime(2024, 3, 1, 12, 30, 0)


def test_invalid_timestamp_string_null(spark):
    assert _one(spark, "not a time", T.TimestampType()) is None


def test_null_passthrough(spark):
    assert _one(spark, None, T.TimestampType()) is None
    assert _one(spark, None, T.LongType()) is None


def test_decimal(spark):
    from decimal import Decimal

    assert _one(spark, "12.34", T.DecimalType(10, 2)) == Decimal("12.34")
