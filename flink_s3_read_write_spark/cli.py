"""Job CLI — the reference's user surface, re-expressed.

The reference ships three runnable jobs (`S3ReadWriteExample`,
`S3FlinkFilterJacksonville`, `S3FlinkAverageSalaryByCity`), each a
``main()`` over S3 paths.  This CLI is the switch-over path for those
users: same three jobs, same semantics (header leak, strict casts,
``%s,%.2f,%d`` output), local or ``s3a://`` paths, batch by default or
``--streaming`` for the unbounded twin.

    python -m flink_s3_read_write_spark.cli uppercase      --in IN --out OUT
    python -m flink_s3_read_write_spark.cli filter-city    --in IN --out OUT [--city X]
    python -m flink_s3_read_write_spark.cli avg-salary     --in IN --out OUT [--city X]

Streaming mode adds ``--checkpoint`` (required) and runs until
terminated, committing rolling text parts exactly-once per trigger.

Beyond the three reference jobs, any registry query runs over a table
directory (local or s3a://):

    python -m flink_s3_read_write_spark.cli query --name q3_avg_by_group \
        --sf /root/testdata/sf0.01 [--out OUT.parquet] [--show N]
"""

from __future__ import annotations

import argparse

from flink_s3_read_write_spark.operators import raw_text
from flink_s3_read_write_spark.session import build_session
from flink_s3_read_write_spark.sources import io
from flink_s3_read_write_spark.streaming import jobs


def _batch_transform(job: str, spark, in_path: str, city: str):
    lines = io.read_text_lines(spark, in_path)
    if job == "uppercase":
        return raw_text.uppercase_lines(lines)
    toks = raw_text.tokenize_csv(lines)
    if job == "filter-city":
        return raw_text.rejoin_csv(raw_text.filter_excluding_city(toks, city))
    kept = raw_text.filter_excluding_city(toks, city, drop_header=True)
    agg = raw_text.avg_salary_by_city(raw_text.extract_city_salary(kept))
    return raw_text.format_avg_output(agg)


def _stream_transform(job: str, spark, in_path: str, city: str):
    if job == "uppercase":
        return jobs.uppercase_stream(spark, in_path)
    if job == "filter-city":
        return jobs.filter_exclude_stream(spark, in_path, city)
    agg = jobs.avg_by_key_update_stream(spark, in_path, city)
    return raw_text.format_avg_output(agg)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="flink_s3_read_write_spark")
    ap.add_argument("job", choices=["uppercase", "filter-city", "avg-salary", "query"])
    ap.add_argument("--in", dest="in_path")
    ap.add_argument("--out", dest="out_path")
    ap.add_argument("--name", help="registry query name (job=query)")
    ap.add_argument("--sf", help="table directory (job=query)")
    ap.add_argument("--show", type=int, default=20,
                    help="rows to print when --out is absent (job=query)")
    ap.add_argument("--city", default="Jacksonville")
    ap.add_argument("--streaming", action="store_true")
    ap.add_argument("--checkpoint", help="required with --streaming")
    ap.add_argument("--single-file", action="store_true",
                    help="one output part (the reference's setParallelism(1) shape)")
    ap.add_argument("--max-records-per-file", type=int, default=None)
    ap.add_argument("--max-part-bytes", type=int, default=None,
                    help="byte-size part rolling (the reference's "
                         "withMaxPartSize: 128MB/1GB), converted via "
                         "sampled average row size")
    ap.add_argument("--trigger-seconds", type=int, default=60)
    ap.add_argument("--s3", action="store_true", help="apply the S3A/magic-committer profile")
    args = ap.parse_args(argv)

    if args.job == "query":
        if not args.name or not args.sf:
            ap.error("query requires --name and --sf")
        from flink_s3_read_write_spark.queries import registry

        reg = registry()
        if args.name not in reg:
            ap.error(f"unknown query {args.name!r}; see QUERIES.md "
                     f"({len(reg)} registered)")
        spark = build_session(f"query:{args.name}", s3=args.s3)
        df = reg[args.name].fn(spark, args.sf)
        if args.out_path:
            io.write_parquet(df, args.out_path)
        else:
            df.show(args.show, truncate=False)
        return 0

    if not args.in_path or not args.out_path:
        ap.error(f"{args.job} requires --in and --out")
    spark = build_session(f"job:{args.job}", s3=args.s3)
    if args.streaming:
        if not args.checkpoint:
            ap.error("--checkpoint is required with --streaming")
        df = _stream_transform(args.job, spark, args.in_path, args.city)
        # avg-salary is an aggregate: streaming file sinks are
        # append-only, so materialize full state per batch instead —
        # as TEXT (same '%s,%.2f,%d' lines as the batch path) and on
        # the same continuous trigger as the other jobs.
        if args.job == "avg-salary":
            q = jobs.start_materialized_view(
                df, args.out_path, args.checkpoint,
                fmt="text", trigger_seconds=args.trigger_seconds,
            )
        else:
            q = io.start_text_stream_sink(
                df, args.out_path, args.checkpoint,
                trigger_seconds=args.trigger_seconds,
                max_records_per_file=args.max_records_per_file,
            )
        q.awaitTermination()
        return 0
    df = _batch_transform(args.job, spark, args.in_path, args.city)
    io.write_text(
        df, args.out_path,
        single_file=args.single_file,
        max_records_per_file=args.max_records_per_file,
        max_part_bytes=args.max_part_bytes,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
