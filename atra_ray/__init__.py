"""atra_ray — a Ray-Data-native re-implementation of the data-processing
capabilities of FelixEngl/atra (reference at /root/reference, read-only).

Not a port: atra is a single-node async Rust crawler; atra_ray expresses the
same semantics as Ray Data pipelines over Arrow batches:

- pages live in a Common-Crawl-style Parquet table
  ``(url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string)``
- stateless per-page work (decode, format sniff, link extraction, text
  extraction, language id) is ``Dataset.map_batches(fn, batch_format="pyarrow")``
- stateful crawl machinery (URL frontier with per-host priority queues and
  politeness clocks, partitioned bloom-filter URL-seen shards) is a fixed set
  of named Ray actors addressed by hash partitioning
- the crawl loop is a driver-side BSP fixpoint: while the frontier is
  non-empty, run a wave, checkpoint, build the next frontier.

Layout:
    functions/  pure, deterministic per-batch kernels (no Ray imports)
    stages/     map_batches callables (stateless fns + actor-pool classes)
    sources/    readers (pages table, seed lists) + fixture generator
    state/      frontier / seen-set actor shards + checkpoint layout
    pipelines/  the BSP crawl driver + the minimum extract slice
"""

__version__ = "0.1.0"
