"""Stateful crawl machinery: sharded URL-seen filters, frontier shards with
per-host priority queues + politeness clocks, and the Parquet checkpoint
layout. All actors are addressed by explicit hash partitioning —
``hash(canonical_url) % seen_shards`` and ``hash(origin) % frontier_shards``
— so membership is stable and independent of cluster size (SURVEY.md §4)."""
