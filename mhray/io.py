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
