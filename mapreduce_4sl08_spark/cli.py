"""Command-line word count — the reference's user interface, kept.

The reference is invoked as ``java MainMaster file1 file2 ...``
(/root/reference/src/MainMaster.java:4-10) and writes
``final_result.txt`` sorted by (count ASC, word ASC)
(/root/reference/src/MasterNode.java:200-209). This CLI accepts the
same inputs and produces the same relation; output format/location are
explicit flags instead of hardcoded, and everything runs distributed.

    python -m mapreduce_4sl08_spark file1.txt file2.txt -o out_dir
    python -m mapreduce_4sl08_spark corpus/*.txt -o out --format csv --single-file
"""

from __future__ import annotations

import argparse


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="mapreduce_4sl08_spark",
        description="Distributed word count (reference-parity pipeline).")
    p.add_argument("files", nargs="+", help="input text files/globs")
    p.add_argument("-o", "--output", required=True, help="output directory")
    p.add_argument("--format", choices=["text", "csv", "parquet"], default="csv")
    p.add_argument("--single-file", action="store_true",
                   help="one output file (reference K2 EXPLICIT mode)")
    p.add_argument("--master", default=None, help="spark master override")
    args = p.parse_args(argv)

    from .operators.wordcount import word_count_files
    from .session import get_session
    from .sources import write_any
    from pyspark.sql import functions as F

    spark = get_session("wordcount-cli", master=args.master)
    result = word_count_files(spark, args.files)
    if args.format == "text":
        # reference line shape "word: count" (WorkerNode.java:167-170)
        result = result.select(
            F.concat_ws(": ", F.col("word"), F.col("count").cast("string")).alias("value"))
    write_any(result, args.format, args.output, single_file=args.single_file)
    n = spark.read.format(args.format).options(
        **({"header": "true"} if args.format == "csv" else {})).load(args.output).count()
    print(f"wrote {n} words to {args.output} ({args.format})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
