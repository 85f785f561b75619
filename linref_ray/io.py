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
        ds = ray.data.read_parquet(path, columns=columns, **kwargs)
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
