"""Dataset I/O seam: Lance when available, Parquet otherwise.

The BASELINE input_hint names Lance tables; this container has no
``lance`` wheel, so the engine reads/writes Parquet with identical
schemas and switches to Lance transparently when the package is
importable (same seam for every table the pipelines touch).
"""

from __future__ import annotations

import ray.data

try:
    import lance  # noqa: F401

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


def read_table(path: str, columns: list[str] | None = None) -> "ray.data.Dataset":
    if HAVE_LANCE and path.endswith(".lance"):
        return ray.data.read_lance(path, columns=columns)
    return ray.data.read_parquet(path, columns=columns)


def write_table(ds: "ray.data.Dataset", path: str) -> None:
    if HAVE_LANCE and path.endswith(".lance"):
        ds.write_lance(path)
    else:
        ds.write_parquet(path)


def read_documents(path: str, fmt: str | None = None,
                   id_col: str = "doc_id", text_col: str = "text",
                   **reader_kwargs) -> "ray.data.Dataset":
    """Read a documents table from parquet / lance / JSONL / CSV into
    the canonical (doc_id int64, text string) shape every text
    operator consumes. Format is sniffed from the extension unless
    ``fmt`` forces it. JSONL/CSV rows without an id column get a
    stable one assigned from a hash of the text (order-independent —
    Ray Data block order is not a stable id source at scale).
    """
    import pyarrow as pa

    if fmt is None:
        low = path.lower()
        if low.endswith((".jsonl", ".json", ".ndjson")):
            fmt = "jsonl"
        elif low.endswith(".csv"):
            fmt = "csv"
        elif low.endswith(".lance"):
            fmt = "lance"
        else:
            fmt = "parquet"
    if fmt == "jsonl":
        ds = ray.data.read_json(path, **reader_kwargs)
    elif fmt == "csv":
        ds = ray.data.read_csv(path, **reader_kwargs)
    elif fmt == "lance":
        ds = ray.data.read_lance(path, **reader_kwargs)
    else:
        ds = ray.data.read_parquet(path, **reader_kwargs)

    schema = ds.schema()
    names = getattr(schema, "names", schema)

    def canon(batch: pa.Table) -> pa.Table:
        if id_col in batch.column_names:
            ids = batch.column(id_col).cast(pa.int64())
        else:
            from mhray.kernels import hash_strings64

            # stable content-derived id, strictly non-negative
            h = hash_strings64(batch.column(text_col))
            ids = pa.array(h & ((1 << 63) - 1), pa.int64())
        return pa.table({id_col: ids,
                         text_col: batch.column(text_col).cast(pa.string())})

    if text_col not in names:
        raise ValueError(f"read_documents: no '{text_col}' column in {path} "
                         f"(found {list(names)})")
    return ds.map_batches(canon, batch_format="pyarrow",
                          zero_copy_batch=True)
