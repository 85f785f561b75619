"""Image-corpus sources/sinks (BASELINE.json ``input_hint`` contract).

The deployment format is Lance — a columnar format with fast random access
that Ray Data reads natively via ``ray.data.read_lance`` (fragment-parallel,
column-pruned, zero-copy Arrow, same streaming semantics as the parquet
reader). The ``lance`` package is not shipped in this container, so the
Lance path is import-gated; parquet is the test-environment stand-in with
the identical Arrow schema. Everything downstream (the flagship pipeline,
invariants, dedup) is format-agnostic — it consumes ``ray.data.Dataset``
blocks with the schema below.
"""

from __future__ import annotations

import logging

import pyarrow as pa
import ray.data

#: The corpus schema from BASELINE.json's input_hint, verbatim.
IMAGE_CORPUS_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)


def _strip_schema_metadata(t: pa.Table) -> pa.Table:
    # Metadata-only rewrite: shares every column buffer with the input.
    return t.replace_schema_metadata(None) if t.schema.metadata else t


def read_parquet_clean(*args, **kwargs) -> ray.data.Dataset:
    """``ray.data.read_parquet`` that drops parquet-born schema metadata.

    pandas-written parquet carries a ``b'pandas'`` schema-metadata key; any
    schema WITH metadata is unhashable in pyarrow (``Schema.__hash__`` hashes
    the metadata dict and raises), which defeats Ray Data's block-schema
    dedup in every reduce task and floods logs with "Failed to hash the
    schemas (for deduplication)" warnings. The strip runs inside the read
    task itself (``_block_udf``) — zero extra stages, and it also covers the
    ``ReadParquet->SplitBlocks`` shape where a downstream map would not fuse.
    """
    kwargs.setdefault("_block_udf", _strip_schema_metadata)
    return ray.data.read_parquet(*args, **kwargs)


class _SchemaHashNoiseFilter(logging.Filter):
    """Drop the one residual "Failed to hash the schemas" warning.

    With ``read_parquet_clean`` every block on the data path has a
    metadata-free (hashable) schema, so schema dedup works in all reduce
    tasks. The only remaining emitter is driver-side PLAN-TIME inference,
    which unifies schemas read straight from parquet footers we cannot
    rewrite (read-only test data carries a ``b'pandas'`` key). That path is
    advisory metadata aggregation, not block handling — filter the noise.
    """

    def filter(self, record: logging.LogRecord) -> bool:
        return "Failed to hash the schemas" not in record.getMessage()


logging.getLogger(
    "ray.data._internal.arrow_ops.transform_pyarrow"
).addFilter(_SchemaHashNoiseFilter())


class _EmptySplitSchemaNoiseFilter(logging.Filter):
    """Drop the empty-schema "RefBundle with a different schema" warning.

    Ray 2.49's ``repartition(n)`` emits ZERO-COLUMN empty blocks for splits
    beyond the available rows (verified directly on
    ``from_arrow(3 rows).repartition(8)``: 5 of 8 output blocks carry an
    empty schema). Every engine kernel emits typed empty tables, so the only
    schema "divergence" on our pipelines is Ray's own schema-less split
    padding — noise on any small input with ``num_partitions`` headroom.
    Only the empty-new-schema form is dropped (message ends ``new schema:
    .``); a genuine drift between two non-empty schemas still warns.
    """

    def filter(self, record: logging.LogRecord) -> bool:
        msg = record.getMessage()
        return not (
            "RefBundle with a different schema" in msg
            and "new schema: . This may lead" in msg
        )


logging.getLogger(
    "ray.data._internal.execution.streaming_executor_state"
).addFilter(_EmptySplitSchemaNoiseFilter())


def validate_corpus_schema(ds: ray.data.Dataset) -> None:
    """Check the input_hint columns are present (types are coerced lazily
    by the pipeline stages; missing columns fail fast here instead)."""
    names = set(ds.schema().names)
    missing = [f.name for f in IMAGE_CORPUS_SCHEMA if f.name not in names]
    if missing:
        raise ValueError(
            f"image corpus missing required columns {missing}; "
            f"expected {[f.name for f in IMAGE_CORPUS_SCHEMA]}"
        )


def read_image_corpus(
    path: str,
    format: str = "auto",
    columns: list[str] | None = None,
    **kwargs,
) -> ray.data.Dataset:
    """Read an image+caption corpus as a streaming Dataset.

    ``format='auto'`` picks Lance for ``*.lance`` paths and parquet
    otherwise. Pass ``columns`` to prune at the read — a pipeline that only
    needs the sidecar columns must not move the wide ``bytes`` column off
    storage.
    """
    if format == "auto":
        format = "lance" if path.rstrip("/").endswith(".lance") else "parquet"
    if format == "lance":
        try:
            import lance  # noqa: F401
        except ImportError as exc:
            raise ImportError(
                "the 'lance' package is required to read Lance datasets "
                "(deployment format; not shipped in this test container) — "
                "pip install pylance, or use the parquet stand-in"
            ) from exc
        ds = ray.data.read_lance(path, columns=columns, **kwargs)
    elif format == "parquet":
        ds = read_parquet_clean(path, columns=columns, **kwargs)
    else:
        raise ValueError(f"unknown corpus format {format!r}")
    if columns is None:
        validate_corpus_schema(ds)
    return ds


def write_image_corpus(
    ds: ray.data.Dataset,
    path: str,
    format: str = "auto",
    **kwargs,
) -> None:
    """Write a corpus; partitioned parquet by default (one file per block —
    resumable output), Lance when requested and available."""
    if format == "auto":
        format = "lance" if path.rstrip("/").endswith(".lance") else "parquet"
    if format == "lance":
        try:
            import lance  # noqa: F401
        except ImportError as exc:
            raise ImportError(
                "the 'lance' package is required to write Lance datasets"
            ) from exc
        ds.write_lance(path, **kwargs)
    elif format == "parquet":
        ds.write_parquet(path, **kwargs)
    else:
        raise ValueError(f"unknown corpus format {format!r}")
