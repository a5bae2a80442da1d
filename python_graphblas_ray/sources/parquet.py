"""Parquet reading helpers."""

from __future__ import annotations

import pyarrow as pa


def read_parquet_clean(path, columns=None, **kwargs):
    """``ray.data.read_parquet`` + schema-metadata strip.

    Pandas-written parquet carries a ``b'pandas'`` schema-metadata blob
    that makes ``pa.Schema`` unhashable ("Failed to hash the schemas"
    warnings), which also disables Ray Data's schema-deduplication early
    exit in every downstream block concat. Dropping the metadata is a
    zero-copy table rewrap.
    """
    import ray.data

    if "schema" not in kwargs:
        try:  # strip at the scanner too — blocks inside the read task
            import pyarrow.parquet as pq

            schema = pq.read_schema(path).remove_metadata()
            if columns:
                schema = pa.schema([schema.field(c) for c in columns])
            kwargs["schema"] = schema
        except Exception:
            pass  # directories/multi-file paths: the strip stage covers it
    ds = ray.data.read_parquet(path, columns=columns, **kwargs)

    def strip(t: pa.Table) -> pa.Table:
        return t.replace_schema_metadata(None)

    return ds.map_batches(strip, batch_format="pyarrow")
