"""SQL92 property-filter tests (reference P2: MessageSelector.bySql +
broker enablePropertyFilter; example PropertyFilterExamples.java:24)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rocketmq_flink_spark.functions.sql92 import Sql92Error, compile_sql92


def test_equality_and_boolean_ops():
    f = compile_sql92("item = 'iphone 12' AND price > 500")
    assert f({"item": "iphone 12", "price": "999"})
    assert not f({"item": "iphone 12", "price": "100"})
    assert not f({"item": "pixel", "price": "999"})


def test_numeric_vs_string_comparison():
    f = compile_sql92("a > 9")
    assert f({"a": "10"})  # numeric compare, not lexicographic
    assert not f({"a": "9"})
    g = compile_sql92("s > 'b'")
    assert g({"s": "c"}) and not g({"s": "a"})


def test_missing_property_is_never_matched():
    f = compile_sql92("a = 'x'")
    assert not f({})
    g = compile_sql92("a <> 'x'")
    assert not g({})  # SQL three-valued logic: NULL <> 'x' is not TRUE


def test_is_null_and_is_not_null():
    f = compile_sql92("a IS NULL")
    assert f({}) and not f({"a": "1"})
    g = compile_sql92("a IS NOT NULL AND a = '1'")
    assert g({"a": "1"}) and not g({})


def test_in_and_not_in():
    f = compile_sql92("color IN ('red', 'blue')")
    assert f({"color": "red"}) and not f({"color": "green"})
    g = compile_sql92("color NOT IN ('red')")
    assert g({"color": "blue"}) and not g({"color": "red"}) and not g({})


def test_between():
    f = compile_sql92("n BETWEEN 3 AND 7")
    assert f({"n": "3"}) and f({"n": "7"}) and not f({"n": "8"})
    g = compile_sql92("n NOT BETWEEN 3 AND 7")
    assert g({"n": "8"}) and not g({"n": "5"})


def test_parens_not_or():
    f = compile_sql92("NOT (a = '1' OR b = '2') AND c = '3'")
    assert f({"a": "0", "b": "0", "c": "3"})
    assert not f({"a": "1", "b": "0", "c": "3"})


def test_quoted_string_escape():
    f = compile_sql92("s = 'it''s'")
    assert f({"s": "it's"})


def test_malformed_raises():
    for bad in ["a >", "a = 'x' OR", "(a = '1'", "a IN ()", "= 'x'", "a !> 3"]:
        with pytest.raises(Sql92Error):
            compile_sql92(bad)


def test_datasource_sql_option_end_to_end(spark, tmp_path):
    """The `sql` source option filters messages below the DataFrame layer
    (reader-side), like the reference broker with enablePropertyFilter."""
    from rocketmq_flink_spark.sources import register

    register(spark)
    root = str(tmp_path / "broker")
    src = spark.createDataFrame(
        [(1, "iphone 12", "999"), (2, "pixel", "550"), (3, "iphone 12", "400")],
        "id INT, item STRING, price STRING",
    )
    from rocketmq_flink_spark.functions import encode_rows

    env = encode_rows(
        src,
        options={
            "topic": "shop",
            "isDynamicProperty": "true",
            "dynamicPropertyColumns": "item,price",
        },
    )
    env.write.format("rocketmq").options(path=root, topic="shop").mode(
        "append"
    ).save()

    out = (
        spark.read.format("rocketmq")
        .options(path=root, topic="shop", sql="item = 'iphone 12' AND price > 500")
        .load()
    )
    rows = out.select(F.col("props").getItem("price").alias("p")).collect()
    assert [r.p for r in rows] == ["999"]

    # malformed predicate fails at plan time (factory validation analog)
    with pytest.raises(Exception, match="Sql92|expected"):
        (
            spark.read.format("rocketmq")
            .options(path=root, topic="shop", sql="item = ")
            .load()
            .count()
        )
