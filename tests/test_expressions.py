"""Unit tests for the scalar-expression library (SURVEY §2.7 X1–X23),
including the reference's documented quirks (error-as-null, blank-vs-null
bridging, two-format embedded dates)."""

from __future__ import annotations

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from beacon_data_importer_spark.functions import expressions as E


def one(df, colexpr):
    return df.select(colexpr.alias("v")).collect()[0].v


def col_of(spark, values, name="c"):
    return spark.createDataFrame([Row(**{name: v}) for v in values])


def test_parse_date_dmy_valid_and_null_on_error(spark):
    df = col_of(spark, ["31/01/1980", "31/13/1980", "", "garbage"])
    out = [r.v for r in df.select(E.parse_date_dmy("c").alias("v")).collect()]
    assert out == [datetime.date(1980, 1, 31), None, None, None]


def test_parse_embedded_date_two_formats(spark):
    df = col_of(
        spark,
        [
            "call back 07/03/2021 please",
            "ring 07.03.21",
            "no date here",
            "maybe 99/99/9999",
        ],
    )
    out = [r.v for r in df.select(E.parse_embedded_date("c").alias("v")).collect()]
    assert out[0] == datetime.date(2021, 3, 7)
    assert out[1] == datetime.date(2021, 3, 7)
    assert out[2] is None
    assert out[3] is None


def test_parse_food_priority(spark):
    df = col_of(spark, ["Priority 1", "priority 3", "urgent", ""])
    out = [r.v for r in df.select(E.parse_food_priority("c").alias("v")).collect()]
    assert out == ["1", "3", None, None]


def test_parse_yes_no_tristate(spark):
    df = col_of(spark, ["Yes", " no ", "maybe", ""])
    out = [r.v for r in df.select(E.parse_yes_no("c").alias("v")).collect()]
    assert out == [True, False, None, None]


def test_concat_address_skips_blanks(spark):
    df = spark.createDataFrame([Row(a="1 High St", b="", c="Leeds")])
    v = one(df, E.concat_address([F.col("a"), F.col("b"), F.col("c")]))
    assert v == "1 High St, Leeds"


def test_compose_body_labels_and_prefix(spark):
    df = spark.createDataFrame([Row(a=" val ", b="  ")])
    v = one(
        df,
        E.compose_body(
            [("A", F.col("a")), ("B", F.col("b"))], prefix_lines=["[Import]"]
        ),
    )
    assert v == "[Import]\nA: val"


def test_nullify_no(spark):
    df = col_of(spark, ["No", " NO ", "gluten free", ""])
    out = [r.v for r in df.select(E.nullify_no("c").alias("v")).collect()]
    assert out == [None, None, "gluten free", None]


def test_json_provenance_shape(spark):
    df = spark.createDataFrame([Row(a="x", b="y")])
    v = one(df, E.json_provenance(["a", "b"]))
    assert v == '{"a":"x","b":"y"}'


def test_callback_start_date_fallback(spark):
    df = spark.createDataFrame(
        [
            Row(cb=datetime.date(2020, 5, 1), latest=datetime.date(2020, 4, 1)),
            Row(cb=None, latest=datetime.date(2020, 4, 1)),
        ]
    )
    out = [
        r.v for r in df.select(E.callback_start_date("cb", "latest").alias("v")).collect()
    ]
    assert out == [datetime.date(2020, 5, 1), datetime.date(2020, 4, 7)]


def test_determine_completion(spark):
    df = spark.createDataFrame(
        [
            Row(s="Yes", d=datetime.date(2020, 4, 1)),
            Row(s="no 3 attempts made", d=datetime.date(2020, 4, 2)),
            Row(s="no 1 attempt made", d=datetime.date(2020, 4, 3)),
        ]
    )
    out = [
        r.v
        for r in df.select(
            E.determine_completion("s", ["yes", "no 3 attempts made"], "d").alias("v")
        ).collect()
    ]
    assert out == [datetime.date(2020, 4, 1), datetime.date(2020, 4, 2), None]


def test_portable_hash64_matches_python(spark):
    import hashlib

    df = col_of(spark, ["hello world"])
    v = one(df, E.portable_hash64("c", seed=7))
    expect = int(hashlib.md5(b"7|hello world").hexdigest()[:15], 16)
    assert v == expect


def test_string_agg_deterministic(spark):
    df = spark.createDataFrame([Row(k=1, v="b"), Row(k=1, v="a"), Row(k=1, v="c")])
    out = df.groupBy("k").agg(E.string_agg("v").alias("s")).collect()[0].s
    assert out == "a, b, c"
