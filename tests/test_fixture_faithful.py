"""Fixture-faithful golden tests for the reference's three jobs
(SURVEY.md §5.2.1): Q1 uppercase, Q2 filter-city (header leaks
through), Q3 avg-salary-by-city ("%s,%.2f,%d", 99 cities, count 1).

Reference anchors: S3ReadWriteExample.java:22-40,
S3FlinkFilterJacksonville.java:31-51,
S3FlinkAverageSalaryByCity.java:28-48.
"""

from __future__ import annotations

import pytest

from flink_s3_read_write_spark.operators import raw_text
from tests.conftest import CITIES, salary_lines


def values(df) -> list[str]:
    return [r[0] for r in df.select("value").collect()]


def test_q1_uppercase_digits_identity(spark, textlines_raw):
    out = values(raw_text.uppercase_lines(textlines_raw))
    assert sorted(out) == ["1", "2", "3", "4", "5", "6"]


def test_q1_uppercase_alpha(spark):
    df = spark.createDataFrame([("hello",), ("WoRld",)], "value string")
    assert sorted(values(raw_text.uppercase_lines(df))) == ["HELLO", "WORLD"]


def test_q2_filter_city_keeps_header_drops_jacksonville(salary_raw):
    toks = raw_text.tokenize_csv(salary_raw)
    kept = raw_text.rejoin_csv(raw_text.filter_excluding_city(toks, "Jacksonville"))
    out = values(kept)
    # 100 lines: header + 99 data rows (SURVEY.md §2.3.2 header leak).
    assert len(out) == 100
    assert "ID,Name,Age,City,Salary" in out
    assert not any(",Jacksonville," in line for line in out)
    # Re-joined lines are byte-identical to the surviving inputs.
    expected = [l for l in salary_lines() if ",Jacksonville," not in l]
    assert sorted(out) == sorted(expected)


def test_q3_avg_salary_golden(salary_raw):
    toks = raw_text.tokenize_csv(salary_raw)
    kept = raw_text.filter_excluding_city(toks, "Jacksonville", drop_header=True)
    typed = raw_text.extract_city_salary(kept)
    agg = raw_text.avg_salary_by_city(typed)
    rows = {r["city"]: r for r in agg.collect()}
    # 99 cities, every count 1, avg == that row's salary.
    assert len(rows) == 99
    assert set(rows) == set(CITIES) - {"Jacksonville"}
    assert all(r["cnt"] == 1 for r in rows.values())
    formatted = raw_text.format_avg_output(agg)
    out = values(formatted)
    # "%s,%.2f,%d" — integer-valued salaries render as N.00
    assert all(line.endswith(",1") for line in out)
    assert all(line.split(",")[1].endswith("0") for line in out)
    sample = [l for l in salary_lines() if l.startswith("2,")][0]
    sal = float(sample.split(",")[4])
    assert f"City01,{sal:.2f},1" in out


def test_strict_cast_fails_fast(spark):
    """SURVEY.md §2.3.4 — Double.parseDouble throws on garbage; so do we."""
    df = spark.createDataFrame([("1,A,30,X,notanumber",)], "value string")
    typed = raw_text.extract_city_salary(raw_text.tokenize_csv(df))
    with pytest.raises(Exception, match="strict_double"):
        typed.collect()
