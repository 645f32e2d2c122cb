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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
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


class SyntheticDocsStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch stream of the same seeded synthetic documents.

    Offset contract (the part that makes a custom stream restartable):
    the offset is ``{"row": n}`` — rows [initial, n) have been emitted.
    ``latestOffset`` advances by ``rows_per_batch`` each trigger up to
    ``max_rows``; ``read(start)`` regenerates [start, next) rows
    deterministically from the seed, so a replayed batch yields the
    IDENTICAL rows (exactly-once semantics come from determinism + the
    checkpoint, not from any driver-side buffering — there is nothing
    to buffer). ``commit`` is a no-op: nothing is retained anywhere.

    This is the simple-reader variant (driver-side generation,
    prototype scale); a partition-parallel ``DataSourceStreamReader``
    with per-shard offsets is the same code with offsets per shard —
    the batch reader above already shows the sharded layout.
    """

    def __init__(self, schema, options: dict):
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self.max_rows = int(options.get("max_rows", 1000))
        self.seed = int(options.get("seed", 42))

    def initialOffset(self) -> dict:
        return {"row": 0}

    def latestOffset(self) -> dict:
        # everything up to max_rows is "available now"; the PACING is
        # read(start)'s job — it returns rows_per_batch per call, so an
        # availableNow run still executes as multiple micro-batches
        return {"row": self.max_rows}

    def _gen(self, i: int):
        import random

        rng = random.Random((self.seed << 20) ^ i)
        words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
        n = rng.randint(3, 12)
        text = " ".join(rng.choice(words) for _ in range(n))
        return (i, text, rng.choice(["en", "es", "fr"]), len(text))

    def read(self, start: dict):
        end = {"row": min(start["row"] + self.rows_per_batch, self.max_rows)}
        rows = [self._gen(i) for i in range(start["row"], end["row"])]
        return (iter(rows), end)

    def readBetweenOffsets(self, start: dict, end: dict):
        # replay path after restart: deterministic regeneration
        return iter(self._gen(i) for i in range(start["row"], end["row"]))

    def commit(self, end: dict) -> None:
        pass


def _streaming_reader(self, schema):
    return SyntheticDocsStreamReader(schema, self.options)


# attach the stream reader to the same source class: one format name,
# both spark.read and spark.readStream
SyntheticDocsSource.simpleStreamReader = _streaming_reader
