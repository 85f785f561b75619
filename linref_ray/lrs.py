"""LRS — the declarative schema object mapping table columns to event roles.

Mirrors the reference's ``LRS`` (linref ``ext/lrs.py:9-62``): a frozen,
data-independent description of which columns hold the route key, measures,
and geometry, plus the interval-closure policy. ``validate`` plays the role of
``LRS.study`` (``ext/lrs.py:285-328``) against a ``pyarrow.Schema``.

Internally every pipeline canonicalizes to fixed names (``route_id``, ``beg``,
``end``, ``loc``) at ingest so all kernels are name-stable; the original
columns ride along untouched (zero-copy in Arrow batches).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa

from linref_ray.errors import LRSConfigurationError
from linref_ray.kernels.intervals import CLOSED_OPTIONS

KEY = "route_id"
BEG = "beg"
END = "end"
LOC = "loc"
EVENT_ID = "event_id"


@dataclass(frozen=True)
class LRS:
    key_col: tuple[str, ...] = (KEY,)
    beg_col: str | None = BEG
    end_col: str | None = END
    loc_col: str | None = None
    chain_col: str | None = None
    geom_cols: tuple[str, str, str] | None = None  # (xs, ys, ms) list<double>
    closed: str = "left_mod"

    def __post_init__(self):
        if self.closed not in CLOSED_OPTIONS:
            raise LRSConfigurationError(
                f"closed must be one of {CLOSED_OPTIONS}"
            )
        if isinstance(self.key_col, str):
            object.__setattr__(self, "key_col", (self.key_col,))
        else:
            object.__setattr__(self, "key_col", tuple(self.key_col))

    @property
    def is_linear(self) -> bool:
        return self.beg_col is not None and self.end_col is not None

    @property
    def is_point(self) -> bool:
        return not self.is_linear and self.loc_col is not None

    @property
    def is_located(self) -> bool:
        return self.loc_col is not None

    def effective_key_col(self, names) -> tuple[str, ...]:
        """Key columns including ``chain_col`` when it is declared AND
        present in the data (reference ``ext/base.py:197-213``): chained
        collections group disjoint route fragments per (key, chain) so each
        chain's geometry is contiguous. A declared chain column that is
        absent from the table is ignored, mirroring the reference's dynamic
        inclusion.
        """
        cols = tuple(self.key_col)
        if (
            self.chain_col
            and self.chain_col not in cols
            and self.chain_col in set(names)
        ):
            cols = cols + (self.chain_col,)
        return cols

    def required_cols(self) -> list[str]:
        cols = list(self.key_col)
        if self.beg_col:
            cols.append(self.beg_col)
        if self.end_col:
            cols.append(self.end_col)
        if self.loc_col:
            cols.append(self.loc_col)
        return cols

    def validate(self, schema: pa.Schema) -> None:
        """Check all mapped columns exist (the ``LRS.study`` role)."""
        missing = [c for c in self.required_cols() if c not in schema.names]
        if missing:
            raise LRSConfigurationError(
                f"LRS columns missing from schema: {missing}; have {schema.names}"
            )


DEFAULT_LRS = LRS()
