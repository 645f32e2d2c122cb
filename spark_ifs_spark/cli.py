"""CLI parity with the reference's ``gen`` / ``select`` subcommands
(``/root/reference/src/main/scala/ifs/examples/CommandLine.scala:184-244``).

``gen``: ``--rows/-r`` ``--cols/-c`` (both required, > 0), ``--file/-f``
(conventional CSV), ``--alt-file/-a`` + ``--labels/-l`` (codependent,
``CL:237``), at least one of file/alt-file (``CL:239-244``). We add
``--seed`` (the reference's generator is unseeded — documented fix).

``select``: ``--file/-f`` and/or ``--alt-file/-a`` + ``--labels/-l``,
``--num-features/-n`` (> 0), ``--verbose/-v``. Runs whichever encodings
were given, prints per-encoding fit time (ms) and the selected
``(feature, score)`` list, and when both ran, prints
``SELECTED FEATURES ARE IDENTICAL`` iff the selections agree
(``CL:15-19,167-169``) — the reference's differential self-check.
"""

from __future__ import annotations

import argparse
import sys
import time

from spark_ifs_spark.sources.generator import random_matrices_to_csv


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="spark_ifs_spark", description=__doc__)
    sub = p.add_subparsers(dest="command", required=True)

    g = sub.add_parser("gen", help="generate a random categorical CSV dataset")
    g.add_argument("--rows", "-r", type=int, required=True)
    g.add_argument("--cols", "-c", type=int, required=True)
    g.add_argument("--file", "-f", help="conventional CSV output path")
    g.add_argument("--alt-file", "-a", help="alternate (transposed) CSV output path")
    g.add_argument("--labels", "-l", help="labels CSV output path (with --alt-file)")
    g.add_argument("--seed", type=int, default=42)

    s = sub.add_parser("select", help="run greedy mRMR feature selection")
    s.add_argument("--file", "-f", help="conventional CSV input")
    s.add_argument("--alt-file", "-a", help="alternate CSV input")
    s.add_argument("--labels", "-l", help="labels CSV input (with --alt-file)")
    s.add_argument("--num-features", "-n", type=int, required=True)
    s.add_argument("--verbose", "-v", action="store_true")
    return p


def _validate_files(args, parser: argparse.ArgumentParser) -> None:
    if bool(args.alt_file) != bool(args.labels):  # codependent, CL:237
        parser.error("--alt-file and --labels must be given together")
    if not args.file and not args.alt_file:  # CL:239-244
        parser.error("at least one of --file / --alt-file is required")


def main(argv: list[str] | None = None) -> int:
    parser = _build_parser()
    args = parser.parse_args(argv)

    if args.command == "gen":
        if args.rows <= 0 or args.cols <= 0:
            parser.error("--rows and --cols must be > 0")
        _validate_files(args, parser)
        random_matrices_to_csv(
            args.rows, args.cols, args.seed,
            conventional_file=args.file,
            alternate_file=args.alt_file,
            labels_file=args.labels,
        )
        return 0

    # select
    if args.num_features <= 0:
        parser.error("--num-features must be > 0")
    _validate_files(args, parser)

    from spark_ifs_spark.operators.select_columns import select_columns
    from spark_ifs_spark.operators.select_rows import select_rows
    from spark_ifs_spark.session import get_spark
    from spark_ifs_spark.sources.csv import (
        read_alternate_csv,
        read_conventional_csv,
        read_labels_csv,
    )

    spark = get_spark("spark_ifs_cli")
    conv_sel = alt_sel = None
    if args.file:
        df, feature_cols = read_conventional_csv(spark, args.file)
        t0 = time.perf_counter()
        conv_sel = select_columns(df, "label", feature_cols, args.num_features)
        ms = (time.perf_counter() - t0) * 1000
        print(f"[conventional] fit time: {ms:.0f} ms")
        _print_selection(conv_sel, args.verbose)
    if args.alt_file:
        df, instance_cols = read_alternate_csv(spark, args.alt_file)
        arr_df = df.selectExpr(
            "id",
            f"array({', '.join('CAST(%s AS DOUBLE)' % c for c in instance_cols)}) AS features",
        )
        labels = read_labels_csv(args.labels)
        t0 = time.perf_counter()
        alt_sel = select_rows(arr_df, args.num_features, labels)
        ms = (time.perf_counter() - t0) * 1000
        print(f"[alternate] fit time: {ms:.0f} ms")
        _print_selection(alt_sel, args.verbose)

    if conv_sel is not None and alt_sel is not None:  # CL:167-169
        if [i for i, _ in conv_sel] == [int(i) for i, _ in alt_sel]:
            print("SELECTED FEATURES ARE IDENTICAL")
        else:
            print("SELECTED FEATURES DIFFER")
            return 1
    return 0


def _print_selection(sel: list[tuple[int | float, float]], verbose: bool) -> None:
    print("selected features:", " ".join(str(int(i)) for i, _ in sel))
    if verbose:
        for rank, (i, s) in enumerate(sel, 1):
            print(f"  {rank:>3}. feature {int(i):<6} score {s:.6f}")


if __name__ == "__main__":
    sys.exit(main())
