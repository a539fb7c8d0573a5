"""CLI tests: the three reference-job entry points run end-to-end
from paths to output files with the reference's semantics."""

from __future__ import annotations

import glob

from flink_s3_read_write_spark.cli import main
from tests.conftest import salary_lines


def write_input(spark, path: str, lines: list[str]) -> None:
    spark.createDataFrame([(l,) for l in lines], "value string").coalesce(1).write.text(path)


def read_output(path: str) -> list[str]:
    return [
        line.rstrip("\n")
        for p in sorted(glob.glob(path + "/part-*"))
        for line in open(p)
    ]


def test_cli_uppercase(spark, tmp_path):
    src, out = str(tmp_path / "in"), str(tmp_path / "out")
    write_input(spark, src, ["hello", "world"])
    assert main(["uppercase", "--in", src, "--out", out, "--single-file"]) == 0
    assert sorted(read_output(out)) == ["HELLO", "WORLD"]
    assert len(glob.glob(out + "/part-*")) == 1


def test_cli_filter_city(spark, tmp_path):
    src, out = str(tmp_path / "in"), str(tmp_path / "out")
    write_input(spark, src, salary_lines())
    assert main(["filter-city", "--in", src, "--out", out]) == 0
    got = read_output(out)
    assert len(got) == 100 and "ID,Name,Age,City,Salary" in got
    assert not any(",Jacksonville," in l for l in got)


def test_cli_avg_salary(spark, tmp_path):
    src, out = str(tmp_path / "in"), str(tmp_path / "out")
    write_input(spark, src, salary_lines())
    assert main(["avg-salary", "--in", src, "--out", out, "--single-file"]) == 0
    got = read_output(out)
    assert len(got) == 99
    assert all(l.count(",") == 2 and l.endswith(",1") for l in got)

def test_cli_query_runs_registry_entry(spark, tmp_path, capsys):
    from flink_s3_read_write_spark import cli

    rc = cli.main([
        "query", "--name", "q3_avg_by_group",
        "--sf", "/root/testdata/sf0.001", "--show", "3",
    ])
    assert rc == 0
    assert "event_type" in capsys.readouterr().out

    out = str(tmp_path / "q3_out")
    rc = cli.main([
        "query", "--name", "q3_avg_by_group",
        "--sf", "/root/testdata/sf0.001", "--out", out,
    ])
    assert rc == 0
    assert spark.read.parquet(out).count() == 4


def test_cli_byte_rolling(spark, tmp_path):
    """--max-part-bytes rolls batch output at the byte target, the
    CLI face of the reference's withMaxPartSize."""
    src, out = str(tmp_path / "in"), str(tmp_path / "out")
    write_input(spark, src, [f"line-{i:05d}-{'x' * 30}" for i in range(2000)])
    assert main(["uppercase", "--in", src, "--out", out,
                 "--max-part-bytes", "20000"]) == 0
    import os as _os

    sizes = [_os.path.getsize(p) for p in sorted(glob.glob(out + "/part-*"))]
    assert sum(sizes) == 2000 * 42  # 41 chars + newline
    assert max(sizes) <= 24000
    assert len(sizes) >= 3
