"""Dump / export (S7) and read-side access (S8-as-a-query).

The reference's ``atra dump`` iterates the crawl DB and writes
``meta.jsonbulk`` plus the WARC path list (atra/src/app/dump.rs:27-100);
``atra view`` browses the same rows. Our store is already Parquet, so both
collapse to Dataset reads:

- ``dump_crawl``: crawl output → JSONL meta export (``write_json``), body
  text included or not.
- ``load_results``: lazy Dataset over every wave's results (the read side
  for ad-hoc queries).
"""

from __future__ import annotations

from pathlib import Path

import ray.data as rd

__all__ = ["dump_crawl", "load_results"]

META_COLUMNS = ["url", "wave", "origin", "host_seq", "status", "format",
                "encoding", "had_decode_errors", "lang"]


def load_results(crawl_out_dir: str) -> rd.Dataset:
    files = [str(p) for p in Path(crawl_out_dir, "results").rglob("*.parquet")]
    return rd.read_parquet(files)


def dump_crawl(
    crawl_out_dir: str, dump_dir: str, include_text: bool = False
) -> int:
    """Export crawl metadata as JSONL; returns row count."""
    cols = META_COLUMNS + (["text"] if include_text else [])
    ds = load_results(crawl_out_dir).select_columns(cols)
    ds.write_json(dump_dir)
    import pyarrow.dataset as pads

    files = [str(p) for p in Path(crawl_out_dir, "results").rglob("*.parquet")]
    return pads.dataset(files).count_rows()
