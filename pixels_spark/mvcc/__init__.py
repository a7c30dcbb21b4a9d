"""MVCC table layer (≈ Pixels-Retina + transaction service).

- ``trans``: begin/commit with a monotonic timestamp oracle
  (≈ ``pixels-common/.../transaction/TransService.java:135-197``).
- ``table``: hidden ``_commit_ts`` column, snapshot reads, row-level
  merge-on-read deletes via a deletion table, point lookups
  (≈ ``pixels-retina/.../RetinaResourceManager.java`` insert:705/delete:537,
  ``RGVisibility.java`` bitmaps, hidden column
  ``VectorizedRowBatch.java:54``).
"""

from .table import MvccTable
from .trans import TransContext, TransService

__all__ = ["MvccTable", "TransService", "TransContext"]
