"""Raw line-oriented text sink.

The W2 export and the external-fixture writer emit one output LINE per row.
Round 2 funneled those lines through the CSV writer with
``quoting_style="none"`` — which raises on any value containing a comma,
quote or newline (ADVICE r2).  This sink writes the line column verbatim
(newline-joined, one shard per block), so arbitrary document text and
descriptions survive; only embedded newlines inside a single logical line
would break the record structure, and the writers normalize those
explicitly before reaching the sink.
"""

from __future__ import annotations

from ray.data.block import BlockAccessor
from ray.data.datasource import BlockBasedFileDatasink


class LineTextDatasink(BlockBasedFileDatasink):
    """One text file per block; each row of ``column`` becomes one line."""

    def __init__(self, path: str, column: str = "line", **kwargs):
        kwargs.setdefault("file_format", "txt")
        super().__init__(path, **kwargs)
        self.column = column

    def write_block_to_file(self, block: BlockAccessor, file) -> None:
        col = block.to_arrow().column(self.column)
        vals = col.to_pylist()
        if vals:
            file.write(("\n".join(vals) + "\n").encode("utf-8"))
