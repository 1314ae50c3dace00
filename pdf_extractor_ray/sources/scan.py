"""Metadata-free parquet scan.

The driver's testdata parquet (and any pandas-written parquet) carries
a ``b'pandas'`` schema-metadata entry that makes ``pa.Schema``
unhashable in this pyarrow build (``hash(schema)`` raises
``unhashable type: 'dict'``).  Ray Data hashes block schemas in two hot
places — read-task concat dedup (``transform_pyarrow.unify_schemas``)
and shuffle-aggregator schema dedup — and silently falls back to a
per-batch ``unify_schemas`` when the hash fails, warning "Failed to
hash the schemas" on every block.  Stripping downstream (a fused
``map_batches``) is too late: the warning fires *inside* the ReadParquet
task before any map runs.  The fix is at the scan itself: pass a
metadata-free ``schema=`` (projected to ``columns`` — Ray requires the
declared schema to match the projected batch exactly) so every block
leaves the read task with a hashable schema.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data


def parquet_files(path: str) -> list[str]:
    """Sorted parquet files under *path* (stable partition order)."""
    if os.path.isfile(path):
        return [path]
    return sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
    )


def filter_fields(flt, schema: pa.Schema) -> list[str]:
    """Field names a dataset filter expression references, discovered
    STRUCTURALLY: bind the expression against a zero-row table and add
    each field the Arrow binder reports missing until it binds clean.
    pyarrow exposes no public field-inspection API on Expression, but
    the binder's ``No match for FieldRef.Name(x)`` error names the
    exact missing field, so this terminates in ≤ len(schema) rounds
    with the precise referenced set — no substring matching against
    ``str(filter)`` (which over/under-includes when a field name
    appears inside a literal or renders differently)."""
    import re

    import pyarrow.dataset as pads

    fields: list[str] = []
    for _ in range(len(schema.names) + 1):
        probe = pa.schema([schema.field(f) for f in fields]).empty_table()
        try:
            pads.dataset(probe).to_table(filter=flt)
            return fields
        except Exception as e:  # binder names the first unbound field
            m = re.search(r"FieldRef\.Name\(([^)]*)\)", str(e))
            if not m or m.group(1) in fields or m.group(1) not in schema.names:
                return list(schema.names)  # unparseable → read everything
            fields.append(m.group(1))
    return fields


def scan_parquet(
    paths: str | list[str],
    columns: list[str] | tuple[str, ...] | None = None,
    **kwargs,
) -> ray.data.Dataset:
    """``ray.data.read_parquet`` that emits hashable block schemas.

    Reads the footer schema of the first file on the driver (O(1)),
    strips writer metadata, projects it to *columns*, and passes it as
    the read's declared schema.  Assumes all files share one schema
    (true for every lake/table this engine reads).
    """
    if isinstance(paths, str) and "://" in paths:
        # remote URI (s3://, gcs://, hdfs://) — delegate path expansion
        # and filesystem handling to Ray; the driver-side footer read
        # (and its schema-hash fast path) is a local-lake optimization
        if columns is not None:
            kwargs["columns"] = list(columns)
        return ray.data.read_parquet(paths, **kwargs)
    files = parquet_files(paths) if isinstance(paths, str) else list(paths)
    if not files:
        # nothing at the top level (e.g. nested layout) — let Ray's own
        # path expansion handle it; schema-hash fast path is best-effort
        if columns is not None:
            kwargs["columns"] = list(columns)
        return ray.data.read_parquet(paths, **kwargs)
    schema = pq.read_schema(files[0]).remove_metadata()
    if columns is None:
        return ray.data.read_parquet(files, schema=schema, **kwargs)
    # The declared schema must match the projected batches exactly, and a
    # row filter can only reference projected fields — so widen the
    # projection by the filter's fields and drop them again after the
    # read (select_columns fuses with the read task; the extra columns
    # still prune at the row-group level).
    read_cols = list(columns)
    flt = kwargs.get("filter")
    if flt is not None:
        read_cols += [
            f for f in filter_fields(flt, schema) if f not in read_cols
        ]
    schema = pa.schema([schema.field(c) for c in read_cols])
    kwargs["columns"] = read_cols
    ds = ray.data.read_parquet(files, schema=schema, **kwargs)
    if len(read_cols) != len(columns):
        ds = ds.select_columns(list(columns))
    return ds
