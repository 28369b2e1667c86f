"""Source-layer tests: strict CSV/JSON scans, PK-null filtering, JSON parsing."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from citibike_pipeline_spark.sources.files import (
    parse_json_column,
    read_csv_strict,
    read_json_strict,
    rows_with_pk_filter,
)

SCHEMA = StructType(
    [
        StructField("id", IntegerType(), True),
        StructField("name", StringType(), True),
    ]
)


def test_csv_strict_roundtrip(spark, tmp_path):
    p = str(tmp_path / "t.csv")
    with open(p, "w") as f:
        f.write("id,name\n1,alpha\n2,beta\n")
    got = read_csv_strict(spark, p, SCHEMA).orderBy("id").collect()
    assert [(r.id, r.name) for r in got] == [(1, "alpha"), (2, "beta")]


def test_csv_strict_fails_on_bad_row(spark, tmp_path):
    p = str(tmp_path / "bad.csv")
    with open(p, "w") as f:
        f.write("id,name\nnot_an_int,alpha\n")
    with pytest.raises(Exception):
        read_csv_strict(spark, p, SCHEMA).collect()


def test_json_strict(spark, tmp_path):
    p = str(tmp_path / "t.jsonl")
    with open(p, "w") as f:
        f.write('{"id": 1, "name": "a"}\n{"id": 2, "name": "b"}\n')
    assert read_json_strict(spark, p, SCHEMA).count() == 2


def test_pk_null_filter_counts_drops(spark):
    rows = [{"id": 1, "name": "a"}, {"id": None, "name": "b"}, {"id": 3, "name": None}]
    good, dropped = rows_with_pk_filter(spark, rows, SCHEMA, pk="id")
    assert good.count() == 2 and dropped == 1


def test_parse_json_column(spark):
    df = spark.createDataFrame([('{"k": 7, "tag": "x"}',)], "props string")
    inner = StructType(
        [StructField("k", IntegerType()), StructField("tag", StringType())]
    )
    got = parse_json_column(df, "props", inner).select("props_parsed.k", "props_parsed.tag").collect()[0]
    assert (got.k, got.tag) == (7, "x")
