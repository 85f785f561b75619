"""linref_ray — a Ray-Data-native linear-referencing + spatial-join engine.

A from-scratch reimplementation of the query and data-processing capabilities
of the reference library tariqshihadah/linref, designed Dataset-first:
stateless measure math as zero-copy Arrow ``map_batches`` kernels, per-route
operators as hash-partitioned ``map_groups`` over multi-group numpy kernels,
the relation core as a sorted interval sweep emitting a long-format pair
table, and the spatial layer as a Morton-cell-indexed broadcast actor pool.

IMPORTANT: this package never calls ``ray.init``/``ray.shutdown`` — sessions
are owned by the driver, ``bench.py``, or the test fixture.
"""

from linref_ray.lrs import LRS, DEFAULT_LRS
from linref_ray.options import get_default_lrs, options, set_default_lrs


def __getattr__(name):
    # Lazy imports keep `import linref_ray` light (no Ray import cost until
    # a pipeline is actually built).
    if name == "Events":
        from linref_ray.api import Events

        return Events
    if name == "Relation":
        from linref_ray.relate import Relation

        return Relation
    if name == "errors":
        import linref_ray.errors as errors

        return errors
    raise AttributeError(name)


__all__ = [
    "LRS",
    "DEFAULT_LRS",
    "Events",
    "Relation",
    "errors",
    "options",
    "set_default_lrs",
    "get_default_lrs",
]
__version__ = "0.1.0"
