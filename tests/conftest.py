"""Shared fixtures: one local SparkSession per test run, synthetic
reference-shaped fixtures (FIXTURES.md Group A — same structural
properties as the reference's checked-in files, regenerated, not
copied), and the driver's sf0.001 tables."""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession

from flink_s3_read_write_spark.session import build_session

SF0001 = "/root/testdata/sf0.001"

# --- Group A fixture generators (FIXTURES.md §A) ------------------------
# salary: header + 100 data rows, every City unique, exactly one
# Jacksonville, integer-valued salaries 57000-99000, ages 25-55.
CITIES = ["Jacksonville"] + [f"City{i:02d}" for i in range(1, 100)]


def salary_lines() -> list[str]:
    lines = ["ID,Name,Age,City,Salary"]
    for i, city in enumerate(CITIES, start=1):
        age = 25 + (i * 7) % 31
        salary = 57000 + (i * 419) % 42001
        lines.append(f"{i},Emp{i:03d},{age},{city},{salary}.0")
    return lines


TEXT_LINES = ["1", "2", "3", "4", "5", "6"]


@pytest.fixture(scope="session")
def spark(tmp_path_factory) -> SparkSession:
    wh = str(tmp_path_factory.mktemp("warehouse"))
    s = build_session(
        "tests", cpus=4, shuffle_partitions=4,
        extra_conf={"spark.sql.warehouse.dir": wh},
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    """Corpus dir for table-driven tests — ALWAYS the deterministic
    sf0.001 tables here: golden-value tests pin exact counts/hashes
    to this corpus, so a suite-wide env override would turn a stale
    shell variable into dozens of phantom failures (review r13).
    The streaming module overrides its own copy of this fixture with
    ``SPARK_GRAFT_TEST_SF_DIR`` support (its tests are corpus-
    agnostic equivalences) so the fuzz tier can reach the streaming
    twins — see tests/test_streaming.py."""
    return SF0001


@pytest.fixture(scope="session")
def salary_raw(spark):
    """salary fixture as a raw-text frame (value: string), header included."""
    return spark.createDataFrame([(line,) for line in salary_lines()], "value string")


@pytest.fixture(scope="session")
def textlines_raw(spark):
    return spark.createDataFrame([(line,) for line in TEXT_LINES], "value string")


def arrow_input_cols(df, node: str = "MapInPandas") -> set[str]:
    """Column names fed into each `node` Arrow boundary of df's
    physical plan.  mapInPandas/applyInPandas are column-pruning
    barriers: every name here is serialized into every Arrow batch,
    so operators must prune their input to exactly what the Python
    fn reads (asserted per-operator in test_multimodal/test_dedup/
    test_similarity)."""
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    cols = set()
    for args in re.findall(rf"{node} \w+\(([^)]*)\)", plan):
        for c in args.split(","):
            c = c.strip()
            if c:
                cols.add(c.split("#")[0])
    return cols
