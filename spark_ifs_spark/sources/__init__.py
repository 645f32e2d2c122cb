"""Source/sink layer: CSV readers matching the reference CLI, the seeded
fixture generator, and parquet table loading."""
