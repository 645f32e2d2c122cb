"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API):
a seeded synthetic-documents source that generates its rows INSIDE the
executors, partition-parallel.

Why this exists: the reference's generator (S4) writes a driver-built
CSV; the engine's `sources/generator.py` upgrade builds rows with
`spark.range + rand(seed)`. This source demonstrates the third — and
newest — way: a first-class pluggable source, the API a user would use
to expose a proprietary corpus store or a synthetic workload to
`spark.read.format(...)` without any driver-side materialization.

Scale contract: `partitions()` returns one `InputPartition` per shard;
each executor generates only its shard from `(seed, shard)` — fully
deterministic, no driver bottleneck, linear scale-out with the shard
count. Rows are yielded as tuples (Arrow-batched by the runtime).
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType


class _DocShard(InputPartition):
    def __init__(self, shard: int):
        self.shard = shard


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.n_rows = int(options.get("rows", 1000))
        self.n_shards = int(options.get("shards", 4))
        self.seed = int(options.get("seed", 42))

    def partitions(self):
        return [_DocShard(i) for i in range(self.n_shards)]

    def read(self, partition: _DocShard):
        # per-shard deterministic RNG — same output for a shard no
        # matter which executor runs it or how many shards run at once
        import random

        rng = random.Random((self.seed << 16) ^ partition.shard)
        words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
        lo = partition.shard * self.n_rows // self.n_shards
        hi = (partition.shard + 1) * self.n_rows // self.n_shards
        for i in range(lo, hi):
            n = rng.randint(3, 12)
            text = " ".join(rng.choice(words) for _ in range(n))
            yield (i, text, rng.choice(["en", "es", "fr"]), len(text))


class SyntheticDocsSource(DataSource):
    """``spark.read.format("synthetic_docs")`` after
    ``spark.dataSource.register(SyntheticDocsSource)``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id bigint, text string, lang string, n_chars bigint"

    def reader(self, schema: StructType) -> DataSourceReader:
        return SyntheticDocsReader(schema, self.options)
