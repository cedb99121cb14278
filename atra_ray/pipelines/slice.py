"""The minimum end-to-end slice (SURVEY.md §7.1):

``read_parquet(pages)`` → ``map_batches(extract, batch_format="pyarrow")``
[→ ``write_parquet``]

This is the unit the whole crawl loop wraps: it exercises zero-copy Arrow
batches and proves the byte-identical text invariant. Scale notes: the read
prunes to (url, html) only; batches stay small (wide binary rows); the
extract kernel runs as stateless tasks so Ray's streaming executor scales it
to whatever CPUs exist — no barrier, no materialization.
"""

from __future__ import annotations

import ray.data as rd

from ..config import ExtractionConfig
from ..stages.extract import extract_batch

__all__ = ["extract_pages", "extract_pages_fused", "exploded_links"]

# rows are ~1-20 KB of html; 256 rows/batch keeps per-task memory in the
# low MBs while amortizing task overhead
DEFAULT_BATCH_SIZE = 256


def extract_pages(
    pages_path: str,
    cfg: ExtractionConfig | None = None,
    batch_size: int = DEFAULT_BATCH_SIZE,
    parallelism: int | None = None,
) -> rd.Dataset:
    """pages.parquet → extraction Dataset (EXTRACT_SCHEMA rows).

    ``parallelism`` forces the read into that many blocks (map tasks track
    blocks 1:1, so a single-row-group file would otherwise serialize the
    whole stage); pass ~3-4× the CPU count for benchmarking."""
    cfg = cfg or ExtractionConfig()
    kwargs = {"override_num_blocks": parallelism} if parallelism else {}
    ds = rd.read_parquet(pages_path, columns=["url", "html"], **kwargs)

    def _extract(batch):
        return extract_batch(batch, cfg)

    return ds.map_batches(_extract, batch_format="pyarrow", batch_size=batch_size)


def extract_pages_fused(
    shard_paths: list[str],
    cfg: ExtractionConfig | None = None,
) -> rd.Dataset:
    """Shard-level fused read+extract: one map task per parquet shard file,
    reading (url, html) INSIDE the task.

    Two scale effects vs the generic ``read_parquet`` path: (1) the html
    binary column never crosses the object store — a read operator would
    hand every page body to the extract operator via plasma; (2) per-task
    arrow reads run single-threaded (``use_threads=False``), the correct
    accounting for a 1-CPU task on a shared cluster (hidden reader threads
    oversubscribe nodes and fake low-parallelism throughput). Shard files
    are the natural work unit of the 100-TB layout; a skewed shard is
    bounded by the writer's max shard size.
    """
    import pyarrow.parquet as pq

    cfg = cfg or ExtractionConfig()

    def _read_extract(batch):
        import pyarrow as pa

        out = []
        for path in batch["path"].to_pylist():
            t = pq.read_table(path, columns=["url", "html"], use_threads=False)
            out.append(extract_batch(t, cfg))
        return pa.concat_tables(out)

    return rd.from_items([{"path": p} for p in shard_paths]).map_batches(
        _read_extract, batch_format="pyarrow", batch_size=1
    )


def exploded_links(extracted: rd.Dataset) -> rd.Dataset:
    """links:list<struct> → one row per (url, target, origin, kind)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def _explode(batch: pa.Table) -> pa.Table:
        counts = pc.list_value_length(batch["links"]).fill_null(0)
        urls = batch["url"].take(
            pa.array(
                [i for i, c in enumerate(counts.to_pylist()) for _ in range(c)],
                pa.int64(),
            )
        )
        flat = pc.list_flatten(batch["links"])
        return pa.table(
            {
                "url": urls,
                "target": pc.struct_field(flat, "target"),
                "origin": pc.struct_field(flat, "origin"),
                "kind": pc.struct_field(flat, "kind"),
            }
        )

    return extracted.map_batches(_explode, batch_format="pyarrow")
