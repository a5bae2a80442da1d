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
            if pq.read_metadata(path).num_rows == 0:
                # statically-empty file: 0-row blocks would skip the
                # strip UDF and the dataset's schema would be
                # unrecoverable downstream — return a schema'd empty
                # directly (no read tasks at all)
                return ray.data.from_arrow(schema.empty_table())
        except Exception:
            pass  # directories/multi-file paths: the strip stage covers it
    ds = ray.data.read_parquet(path, columns=columns, **kwargs)

    def strip(t: pa.Table) -> pa.Table:
        return t.replace_schema_metadata(None)

    return ds.map_batches(strip, batch_format="pyarrow")


def write_partitioned(ds, path, key_col, num_partitions=64,
                      resume=True):
    """Resumable partitioned Parquet sink: one ``part=<i>`` directory
    per hash-range of ``key_col``, each stamped with a ``_SUCCESS``
    marker once fully written. A re-run after a failure SKIPS marked
    partitions (their rows are pruned before any write work happens)
    and REWRITES unmarked ones from scratch (half-written files are
    removed first) — never one giant output file, never a duplicate
    row on retry.

    Partition assignment is ``splitmix64(key) % num_partitions`` —
    deterministic across runs, so a row always lands in the same
    directory. Returns the sorted list of partition ids written by THIS
    call (empty when everything was already marked done).
    """
    import os
    import shutil

    import numpy as np

    from ..pipelines.dedup import _splitmix64

    os.makedirs(path, exist_ok=True)

    def _part_dir(i):
        return os.path.join(path, f"part={i}")

    done = set()
    if resume:
        for i in range(num_partitions):
            d = _part_dir(i)
            if os.path.exists(os.path.join(d, "_SUCCESS")):
                done.add(i)
            elif os.path.isdir(d):  # unfinished from a dead run
                shutil.rmtree(d)
    elif os.path.isdir(path):
        for name in os.listdir(path):
            if name.startswith("part="):
                shutil.rmtree(os.path.join(path, name))

    todo = [i for i in range(num_partitions) if i not in done]
    if not todo:
        return []

    def tag(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        part = (_splitmix64(keys.astype(np.uint64))
                % np.uint64(num_partitions)).astype(np.int64)
        batch = batch.append_column("part", pa.array(part))
        if done:
            batch = batch.filter(
                pa.array(~np.isin(part, np.fromiter(done, np.int64))))
        return batch

    ds.map_batches(tag, batch_format="pyarrow").write_parquet(
        path, partition_cols=["part"])

    written = []
    for i in todo:
        d = _part_dir(i)
        # a partition with zero rows gets no directory from the writer;
        # materialize it so resume can tell "done, empty" from "missed"
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "_SUCCESS"), "w") as f:
            f.write("")
        written.append(i)
    return written
