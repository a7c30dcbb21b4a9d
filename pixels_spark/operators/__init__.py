"""Relational operator building blocks (≈ pixels-executor kernels).

These re-express the reference's executor surface as composable DataFrame
transforms:

- ``filters``    ≈ predicate domain model (``Filter``/``ColumnFilter``/
                   ``TableScanFilter``, pixels-executor/.../predicate/).
- ``scan``       ≈ ``Scanner.filterAndProject`` + reader projection/predicate
                   options.
- ``joins``      ≈ ``Joiner``/``HashJoiner``/``SortedJoiner`` + the planner's
                   broadcast-vs-partitioned choice (PlanOptimizer).
- ``aggregates`` ≈ ``Aggregator`` + ``FunctionType`` function set.
- ``sort``       ≈ ``BaseSortWorker`` sort / merge, plus top-k.
- ``temporal``   : as-of join + binned interval range join (beyond the
                   reference's equi-only kernel; Spark-first shapes).

The queries/ package uses plain DataFrame idioms (what a Spark user writes);
this package is the explicit operator API (what an engine embeds), and both
bottom out in identical Catalyst plans.
"""

from .aggregates import Aggregator, FunctionType
from .filters import Bound, BoundType, ColumnFilter, Range, TableScanFilter
from .joins import JoinAlgorithm, JoinType, choose_join_algorithm, equi_join
from .temporal import asof_join, range_join

__all__ = [
    "Bound",
    "BoundType",
    "Range",
    "ColumnFilter",
    "TableScanFilter",
    "JoinType",
    "JoinAlgorithm",
    "choose_join_algorithm",
    "equi_join",
    "Aggregator",
    "FunctionType",
    "asof_join",
    "range_join",
]
