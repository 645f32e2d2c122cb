"""Seeded random categorical dataset generator (CLI ``gen`` parity).

The reference generates a rows×cols matrix of uniform ints 0–9 and writes
up to three CSVs (``/root/reference/src/main/scala/ifs/util/functions.scala:53-75``):

- conventional file: the matrix verbatim (column 0 = label),
- alternate file: transpose of the matrix **minus its first row** (i.e.
  the label column is dropped),
- labels file: the first transposed row (the original label column) as a
  single CSV line.

Deviation: the reference uses an unseeded ``scala.util.Random``
(``functions.scala:54``) so its fixtures are irreproducible; we require a
seed.

Two implementations: driver-side (exact CLI parity, small files) and a
distributed ``spark.range``-based one for generating at cluster scale.
"""

from __future__ import annotations

import csv
import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def random_matrix(rows: int, cols: int, seed: int, num_levels: int = 10) -> list[list[int]]:
    """rows×cols uniform ints in [0, num_levels)."""
    rng = random.Random(seed)
    return [[rng.randrange(num_levels) for _ in range(cols)] for _ in range(rows)]


def matrices_to_csv(
    matrix: list[list[int]],
    conventional_file: str | None = None,
    alternate_file: str | None = None,
    labels_file: str | None = None,
) -> None:
    """Write the generator's three encodings (``functions.scala:64-74``)."""
    if conventional_file:
        with open(conventional_file, "w", newline="") as f:
            csv.writer(f).writerows(matrix)
    if alternate_file or labels_file:
        transposed = list(map(list, zip(*matrix)))
        if labels_file:
            with open(labels_file, "w", newline="") as f:
                csv.writer(f).writerow(transposed[0])
        if alternate_file:
            with open(alternate_file, "w", newline="") as f:
                csv.writer(f).writerows(transposed[1:])


def random_matrices_to_csv(
    rows: int,
    cols: int,
    seed: int,
    conventional_file: str | None = None,
    alternate_file: str | None = None,
    labels_file: str | None = None,
) -> None:
    matrices_to_csv(random_matrix(rows, cols, seed), conventional_file, alternate_file, labels_file)


def random_conventional_df(
    spark: SparkSession, rows: int, cols: int, seed: int, num_levels: int = 10
) -> tuple[DataFrame, list[str]]:
    """Distributed generator: ``(label, f0..f{cols-2})`` uniform categorical.

    ``spark.range`` parallelizes the row space, so this scales to any row
    count; per-cell values come from ``F.rand(seed+j)`` (deterministic per
    column seed — note Spark's ``rand`` is seed-deterministic only for a
    fixed partitioning, which ``spark.range`` gives us).
    """
    base = spark.range(rows)
    names = ["label"] + [f"f{j}" for j in range(cols - 1)]
    projected = base.select(
        *[
            F.floor(F.rand(seed + j) * num_levels).cast("int").alias(name)
            for j, name in enumerate(names)
        ]
    )
    return projected, names[1:]


def random_conventional_md5_df(
    spark: SparkSession, rows: int, cols: int, num_levels: int = 10
) -> tuple[DataFrame, list[str]]:
    """Engine-portable deterministic matrix: ``cell(i, j) =
    md5_int60(f"{i}_{j}") % num_levels`` (column 0 = label).

    The ``F.rand``-based :func:`random_conventional_df` is seed-stable
    only within Spark, so it cannot be oracle-checked; this variant is
    bit-replicable in ANY engine with RFC-1321 md5 (the DuckDB twin
    inlines the same arithmetic), at the cost of one md5 per cell.
    Distributed exactly like the rand variant: ``spark.range``
    parallelizes the row space, the per-cell hash is a scan-fused
    column expression.
    """
    from spark_ifs_spark.functions.hashing import md5_int60

    base = spark.range(rows)
    names = ["label"] + [f"f{j}" for j in range(cols - 1)]
    projected = base.select(
        *[
            (
                md5_int60(
                    F.concat(F.col("id").cast("string"), F.lit(f"_{j}"))
                )
                % num_levels
            )
            .cast("int")
            .alias(name)
            for j, name in enumerate(names)
        ]
    )
    return projected, names[1:]


def engineered_fixture(
    spark: SparkSession, rows: int = 400, n_noise: int = 17, seed: int = 42
) -> tuple[DataFrame, list[str]]:
    """FIXTURES.md §1 engineered-dependency variant.

    - ``f0`` = label with 10% random flips → highest relevance, selected
      first.
    - ``f1`` = ``f0`` exactly → same relevance (tie broken to the lower
      index, f0), then maximal redundancy: round-2 score is
      ``MI(f0,L) − H(f0) < 0``, so mRMR must NOT pick it second.
    - ``f2`` = label with 35% flips → moderately relevant; conditionally
      independent of f0 given the label, so its redundancy is strictly
      below its relevance and it wins round 2.
    - the rest: independent uniform noise.

    (A naive ``f0 = label`` construction would make *every* round-2 score
    exactly 0 — MI(f, f0) ≡ MI(f, label) — degenerating the test to
    tie-breaks; the flips avoid that.)
    """
    rng = random.Random(seed)
    data = []
    for _ in range(rows):
        label = rng.randrange(10)
        f0 = label if rng.random() > 0.10 else rng.randrange(10)
        f2 = label if rng.random() > 0.35 else rng.randrange(10)
        noise = [rng.randrange(10) for _ in range(n_noise)]
        data.append((label, f0, f0, f2, *noise))
    names = ["f0", "f1", "f2"] + [f"f{j + 3}" for j in range(n_noise)]
    df = spark.createDataFrame(data, ["label", *names])
    return df, names
