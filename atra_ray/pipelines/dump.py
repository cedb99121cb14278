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

__all__ = ["dump_crawl", "load_results", "edges_dataset", "edges_of_crawl"]

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


def edges_dataset(crawl_out_dir: str, include_seeds: bool = True) -> rd.Dataset:
    """Web-graph edges (S6) as a STREAMING Dataset: seed edges plus a
    map_batches projection of the results' links column — the at-scale
    path (nothing concatenates on the driver; consume with write_parquet
    or downstream transforms). ``include_seeds=False`` skips the seed-edge
    union for consumers that filter kind='seed' anyway (e.g. PageRank)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def _project(batch: pa.Table) -> pa.Table:
        counts = pc.list_value_length(batch["links"]).fill_null(0)
        src_col = pc.coalesce(batch["final_url"], batch["url"])
        src = src_col.take(
            pa.array(
                [i for i, c in enumerate(counts.to_pylist()) for _ in range(c)],
                pa.int64(),
            )
        )
        flat = pc.list_flatten(batch["links"])
        t = pa.table(
            {
                "src": src,
                "dst": pc.struct_field(flat, "target"),
                "kind": pc.struct_field(flat, "kind"),
            }
        )
        return t.filter(pc.not_equal(t["kind"], "data"))

    files = [str(p) for p in Path(crawl_out_dir, "results").rglob("*.parquet")]
    parts = [
        rd.read_parquet(files, columns=["url", "final_url", "links"]).map_batches(
            _project, batch_format="pyarrow"
        )
    ] if files else []
    seeds = Path(crawl_out_dir, "edges", "seeds.parquet")
    if include_seeds and seeds.exists():
        parts.append(rd.read_parquet(str(seeds)))
    if not parts:
        import pyarrow as pa2

        return rd.from_arrow(
            pa2.table(
                {"src": pa2.array([], pa2.string()),
                 "dst": pa2.array([], pa2.string()),
                 "kind": pa2.array([], pa2.string())}
            )
        )
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return ds


def edges_of_crawl(crawl_out_dir: str):
    """Web-graph edges (S6) derived from the crawl output: the seed edges
    written at seeding plus a projection of every result row's links column
    (src = response url — final redirect destination when set; data links
    excluded; pre budget/blacklist: the graph records discovery, not
    admission). Returns a pyarrow Table."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    tabs = []
    seeds = Path(crawl_out_dir, "edges", "seeds.parquet")
    if seeds.exists():
        tabs.append(pq.read_table(seeds))
    files = [str(p) for p in Path(crawl_out_dir, "results").rglob("*.parquet")]
    for f in files:
        batch = pq.read_table(f, columns=["url", "final_url", "links"])
        counts = pc.list_value_length(batch["links"]).fill_null(0)
        src_col = pc.coalesce(batch["final_url"], batch["url"])
        src = src_col.take(
            pa.array(
                [i for i, c in enumerate(counts.to_pylist()) for _ in range(c)],
                pa.int64(),
            )
        )
        flat = pc.list_flatten(batch["links"])
        t = pa.table(
            {
                "src": src,
                "dst": pc.struct_field(flat, "target"),
                "kind": pc.struct_field(flat, "kind"),
            }
        )
        tabs.append(t.filter(pc.not_equal(t["kind"], "data")))
    return pa.concat_tables(tabs) if tabs else pa.table(
        {"src": pa.array([], pa.string()), "dst": pa.array([], pa.string()),
         "kind": pa.array([], pa.string())}
    )
