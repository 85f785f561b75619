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

__all__ = ["LRS", "DEFAULT_LRS"]
__version__ = "0.1.0"
