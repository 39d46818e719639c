"""Strict file-source + quarantine tests."""
from __future__ import annotations

import pytest
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from spanner_data_validator_spark.sources.files import (
    CORRUPT_COL,
    read_csv_strict,
    read_jsonl_strict,
    split_quarantine,
)

SCHEMA = StructType([
    StructField("id", LongType()),
    StructField("name", StringType()),
    StructField("score", DoubleType()),
])


def _write(path, lines):
    path.write_text("\n".join(lines) + "\n")


def test_jsonl_good_bad_split(spark, tmp_path):
    f = tmp_path / "in.jsonl"
    _write(f, [
        '{"id": 1, "name": "a", "score": 1.5}',
        'this is not json at all',
        '{"id": "NaN-ish", "name": "b", "score": 2.0}',  # uncastable id
        '{"id": 3, "name": "c", "score": 3.25}',
    ])
    good, bad = split_quarantine(read_jsonl_strict(spark, str(f), SCHEMA))
    g = {r.id: r for r in good.collect()}
    assert set(g) == {1, 3} and g[3].score == 3.25
    assert good.columns == ["id", "name", "score"]
    bad_lines = [r[CORRUPT_COL] for r in bad.collect()]
    assert "this is not json at all" in bad_lines
    assert any('"NaN-ish"' in line for line in bad_lines)
    assert len(bad_lines) == 2


def test_csv_split_and_header_drop(spark, tmp_path):
    f = tmp_path / "in.csv"
    _write(f, [
        "id,name,score",
        "1,a,1.5",
        "2,b,not_a_double",
        "3,c,3.0",
    ])
    good, bad = split_quarantine(
        read_csv_strict(spark, str(f), SCHEMA, header=True))
    assert {r.id for r in good.collect()} == {1, 3}
    assert bad.count() == 1
    assert "not_a_double" in bad.first()[CORRUPT_COL]


def test_quarantine_countable_without_cache(spark, tmp_path):
    # the raw-line design must allow corrupt-only aggregation (the native
    # _corrupt_record pseudo-column throws AnalysisException here)
    f = tmp_path / "in.jsonl"
    _write(f, ['{"id": 1, "name": "x", "score": 0.0}', "garbage"])
    _, bad = split_quarantine(read_jsonl_strict(spark, str(f), SCHEMA))
    assert bad.count() == 1


def test_schema_with_corrupt_col_rejected(spark, tmp_path):
    s = StructType([StructField(CORRUPT_COL, StringType())])
    with pytest.raises(ValueError, match="already defines"):
        read_jsonl_strict(spark, str(tmp_path), s)


def test_split_requires_strict_reader(spark):
    df = spark.range(3)
    with pytest.raises(ValueError, match="strict reader"):
        split_quarantine(df)


def test_blank_lines_never_become_phantom_rows(spark, tmp_path):
    f = tmp_path / "in.jsonl"
    f.write_text('{"id": 1, "name": "a", "score": 1.0}\n\n   \n'
                 '{"id": 2, "name": "b", "score": 2.0}\n')
    good, bad = split_quarantine(read_jsonl_strict(spark, str(f), SCHEMA))
    # whitespace-only lines are dropped (native-reader semantics), NOT
    # parsed into all-NULL "good" rows
    assert good.count() == 2 and bad.count() == 0
    assert good.where("id IS NULL").count() == 0


def test_csv_header_variants_dropped(spark, tmp_path):
    f = tmp_path / "in.csv"
    f.write_text('"id","name","score"\n1,a,1.0\nID, Name, Score\n2,b,2.0\n')
    good, bad = split_quarantine(
        read_csv_strict(spark, str(f), SCHEMA, header=True))
    assert {r.id for r in good.collect()} == {1, 2}
    assert bad.count() == 0


def test_schema_with_raw_line_col_rejected(spark, tmp_path):
    import pytest as _pytest
    from pyspark.sql.types import StructField, StructType
    s = StructType([StructField("_raw_line", StringType())])
    with _pytest.raises(ValueError, match="reserved"):
        read_jsonl_strict(spark, str(tmp_path), s)
