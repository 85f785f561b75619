"""User-facing facade: the ``df.lr`` accessor experience over Ray Datasets.

The reference's entry point is ``df.lr.<op>`` (``LRS_Accessor``,
``ext/base.py``); this class gives a user of the reference the same
one-object surface over a ``ray.data.Dataset`` — every method delegates to
the functional pipelines, returns a new ``Events`` (or a Dataset/aggregate),
and keeps the LRS schema attached.

    ev = Events(ray.data.read_parquet(...), LRS(key_col=("route",), ...))
    ev.dissolve(retain=["surface"]).to_pandas()
    ev.relate(other).sum("aadt")
    ev.resegment(0.5).separate().ds.write_parquet(...)
"""

from __future__ import annotations

from typing import Sequence

import ray.data

from linref_ray.lrs import LRS


class Events:
    def __init__(
        self,
        ds: ray.data.Dataset,
        lrs: LRS | None = None,
        id_col: str = "event_id",
    ):
        if lrs is None:
            # Package default (linref_ray.options / set_default_lrs) — the
            # reference's ``options.default_lrs`` fallback.
            from linref_ray.options import get_default_lrs

            lrs = get_default_lrs()
        self.ds = ds
        self.lrs = lrs
        self.id_col = id_col

    def _wrap(self, ds: ray.data.Dataset, lrs: LRS | None = None) -> "Events":
        return Events(ds, lrs or self.lrs, self.id_col)

    # -- pass-throughs -----------------------------------------------------
    def to_pandas(self):
        return self.ds.to_pandas()

    def count(self) -> int:
        return self.ds.count()

    # -- stateless measure ops (events.py) --------------------------------
    def extend(self, d0: float = 0.0, d1: float = 0.0) -> "Events":
        from linref_ray import events as ev

        return self._wrap(ev.extend(self.ds, self.lrs, d0, d1))

    def shift(self, delta: float) -> "Events":
        from linref_ray import events as ev

        return self._wrap(ev.shift(self.ds, self.lrs, delta))

    def round(self, decimals: int = 0, factor: float | None = None) -> "Events":
        from linref_ray import events as ev

        return self._wrap(ev.round_measures(self.ds, self.lrs, decimals, factor))

    def set_monotonic(self) -> "Events":
        from linref_ray import events as ev

        return self._wrap(ev.set_monotonic(self.ds, self.lrs))

    def point_to_linear(self) -> "Events":
        from linref_ray import events as ev

        out = ev.point_to_linear(self.ds, self.lrs)
        new_lrs = LRS(
            key_col=self.lrs.key_col, beg_col="beg", end_col="end",
            loc_col=self.lrs.loc_col, closed=self.lrs.closed,
        )
        return self._wrap(out, new_lrs)

    def drop_invalid(self) -> "Events":
        from linref_ray import events as ev

        return self._wrap(ev.drop_invalid(self.ds, self.lrs))

    def select_group(self, key) -> "Events":
        from linref_ray import events as ev

        return self._wrap(ev.select_group(self.ds, self.lrs, key))

    # -- selection surface (events/selection.py:146-294) -------------------
    def select(self, selector) -> "Events":
        """Select by slice, boolean mask (id-sorted positional order), or
        id array."""
        from linref_ray import events as ev

        return self._wrap(ev.select(self.ds, selector, self.id_col))

    def select_index(self, ids) -> "Events":
        from linref_ray import events as ev

        return self._wrap(ev.select_index(self.ds, ids, self.id_col))

    def select_mask(self, mask) -> "Events":
        from linref_ray import events as ev

        return self._wrap(ev.select_mask(self.ds, mask, self.id_col))

    def select_slice(self, slice_: slice) -> "Events":
        from linref_ray import events as ev

        return self._wrap(ev.select_slice(self.ds, slice_, self.id_col))

    def drop(self, ids) -> "Events":
        from linref_ray import events as ev

        return self._wrap(ev.drop(self.ds, ids, self.id_col))

    def drop_group(self, key) -> "Events":
        from linref_ray import events as ev

        return self._wrap(ev.drop_group(self.ds, self.lrs, key))

    def check_exact_geoms(self, **kw) -> "Events":
        from linref_ray import geometry as gm

        return self._wrap(gm.check_exact_geoms(self.ds, **kw))

    # -- grouped ops (modify.py) ------------------------------------------
    def dissolve(self, retain: Sequence[str] = (), **kw) -> "Events":
        from linref_ray import modify as md

        return self._wrap(md.dissolve(self.ds, self.lrs, retain, **kw))

    def resegment(self, length: float = 1.0, fill: str = "cut") -> "Events":
        from linref_ray import modify as md

        return self._wrap(md.resegment(self.ds, self.lrs, length, fill))

    def separate(self, **kw) -> "Events":
        from linref_ray import modify as md

        return self._wrap(md.separate(self.ds, self.lrs, **kw))

    def duplicated(self, **kw) -> "Events":
        from linref_ray import modify as md

        return self._wrap(md.flag_duplicated(self.ds, self.lrs, **kw))

    def find_inside(self, **kw) -> "Events":
        from linref_ray import modify as md

        return self._wrap(md.flag_inside(self.ds, self.lrs, **kw))

    def constrain_to(self, other: "Events", **kw) -> "Events":
        from linref_ray import modify as md

        return self._wrap(
            md.constrain_to(self.ds, other.ds, self.lrs, other.lrs, **kw)
        )

    def cluster(self, max_gap: float = 0.0, link_col: str | None = None, **kw):
        from linref_ray.spatial import cluster_events

        return self._wrap(
            cluster_events(self.ds, self.lrs, max_gap, link_col, **kw)
        )

    # -- the relation ------------------------------------------------------
    def relate(self, other: "Events", **kw):
        """``EventsRelation`` analog — returns a :class:`Relation`."""
        from linref_ray.relate import Relation

        return Relation(
            self.ds, other.ds, self.lrs, other.lrs,
            id_col=self.id_col, right_id_col=other.id_col, **kw,
        )

    def integrate(self, *others: "Events", **kw):
        from linref_ray import modify as md

        layers = [self.ds] + [o.ds for o in others]
        lrss = [self.lrs] + [o.lrs for o in others]
        return md.integrate(layers, lrss, **kw)

    # -- relation conveniences (reference ext/base.py:2362-2601) ----------
    def cut_from(self, other: "Events", multiple: str = "first", **kw):
        """Cut THIS collection's ranges from ``other``'s geometries
        (``LRS_Accessor.cut_from``, ``ext/base.py:2362-2450``)."""
        return self.relate(other, **kw).cut(multiple=multiple)

    def interpolate_from(self, other: "Events", multiple: str = "first", **kw):
        """Interpolate this collection's point locations on ``other``'s
        geometries (``ext/base.py:2452-2524``)."""
        return self.relate(other, **kw).interpolate_geoms(multiple=multiple)

    def distribute_from(self, other: "Events", col=None, **kw):
        """Distribute ``other``'s values onto this collection's index
        (``ext/base.py:2526-2601``)."""
        rel_kw = {
            k: kw.pop(k)
            for k in ("num_partitions", "left_cols", "right_cols")
            if k in kw
        }
        return self.relate(other, **rel_kw).distribute(col=col, **kw)

    # -- LRS management (reference ext/base.py:804-930) --------------------
    def set_lrs(self, lrs: LRS | None = None, **kwargs) -> "Events":
        """New facade over the same Dataset with a replaced LRS (the
        accessor's ``set_lrs``; this engine's LRS objects are immutable,
        so the facade returns a new Events instead of mutating)."""
        return Events(self.ds, lrs if lrs is not None else LRS(**kwargs),
                      self.id_col)

    def modify_lrs(self, **changes) -> "Events":
        """Replace selected LRS fields (``ext/base.py:853-874``)."""
        import dataclasses

        return Events(
            self.ds, dataclasses.replace(self.lrs, **changes), self.id_col
        )

    def lrs_like(self, other: "Events") -> "Events":
        """Adopt another collection's LRS (``ext/base.py:804-827``)."""
        return Events(self.ds, other.lrs, self.id_col)

    def group_counts(self):
        """Per-group event counts (``ext/base.py:1054-1060``)."""
        return self.ds.groupby(list(self.lrs.key_col)).count()
