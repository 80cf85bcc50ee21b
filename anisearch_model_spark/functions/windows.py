"""Window hygiene helpers.

``Window.orderBy`` with no partition moves ALL rows to one partition
(WindowExec warns, and at scale one executor sorts the world).  Every
global-rank window in this engine therefore (a) bounds its input FIRST via
``orderBy().limit(n)`` — Catalyst plans TakeOrderedAndProject, a
per-partition heap + driver merge — and (b) ranks the ≤n survivors under
an explicit single-partition key from ``constant_partition``.

``partitionBy(F.lit(0))`` does NOT work for (b): Catalyst constant-folds
the foldable partition expression away, resurrecting the unpartitioned
window.  ``col * 0`` is constant-valued but not foldable (the optimizer
cannot simplify ``x * 0`` under null semantics), so it survives as a real
partition key.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def constant_partition(anchor_col: str) -> Column:
    """A non-foldable constant partition key (= 0 for every non-null row).

    ``anchor_col`` must be a non-null column of the frame being ranked
    (ids/keys in all call sites) of ANY type — the length-of-cast form
    stays numeric for string anchors too (a bare ``col * 0`` ANSI-casts
    a string anchor to bigint and throws).  Only use AFTER a bounding
    ``limit``.
    """
    return F.length(F.col(anchor_col).cast("string")) * F.lit(0)
