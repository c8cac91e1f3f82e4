"""Targeted log hygiene for known-cosmetic Ray Data warnings."""

from __future__ import annotations

import logging


class _EmptyBlockSchemaFilter(logging.Filter):
    """Drop ONLY the streaming executor's schema-divergence warning for
    zero-row schema-less blocks.

    Shuffle stages (sort / groupby exchanges) emit empty partitions as
    schema-less blocks that bypass the user function entirely, so a typed
    pipeline with any empty partition triggers "Operator produced a
    RefBundle with a different schema ... new schema: ." noise per stage.
    Every UDF in this repo returns TYPED empty frames (the divergence the
    warning exists to catch — genuinely different column sets — would still
    be reported, because those messages name the columns on both sides).
    """

    def filter(self, record: logging.LogRecord) -> bool:
        msg = record.getMessage()
        if "different schema than the previous one" not in msg:
            return True
        return not (
            "new schema: . This may" in msg
            or "new schema: PandasBlockSchema(names=[], types=[])" in msg
        )


def silence_empty_block_schema_warnings() -> None:
    """Install the filter on the streaming executor's logger (driver side —
    the streaming executor runs in the driver process).  Idempotent."""
    lg = logging.getLogger("ray.data._internal.execution.streaming_executor_state")
    if not any(isinstance(f, _EmptyBlockSchemaFilter) for f in lg.filters):
        lg.addFilter(_EmptyBlockSchemaFilter())
