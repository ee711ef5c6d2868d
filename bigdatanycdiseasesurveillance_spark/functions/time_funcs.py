"""Event-time helpers that tolerate every ``ts`` encoding the driver has
shipped (TIMESTAMP, TIMESTAMP_NTZ) without schema introspection.

The loaders (tables.normalize_timestamps) already canonicalize to
TimestampType; these helpers add defense in depth so a query composed on
a raw DataFrame — or a future driver-side encoding change — degrades to
a cast error in exactly one place instead of five.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_sec(col: Column | str) -> Column:
    """Fractional epoch seconds from a TIMESTAMP or TIMESTAMP_NTZ column.

    ``cast(timestamp)`` is a no-op on TimestampType and a wall-clock
    reinterpretation on NTZ (exact under the engine's pinned UTC session
    timezone); the outer double cast preserves sub-second precision
    (``unix_timestamp`` would truncate to whole seconds).
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp").cast("double")
