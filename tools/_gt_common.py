"""Shared helpers for ground-truth list converters.

The LMDB packing tool (tools/create_lmdb_dataset.py) consumes tab-separated
``<relative image path>\t<label>`` lines; every converter in this directory
ends by emitting such a list. These helpers centralize reading and writing so
each converter is just a record generator over its dataset's native format.
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterable, Iterator, Tuple

Record = Tuple[str, str]


def read_text_lines(path, encoding='utf8') -> Iterator[str]:
    """Yield lines (newline-stripped) from a text file.

    Opens eagerly so a missing input fails before the caller truncates its
    output file (write_gt_list opens the output before consuming records).
    """
    f = open(path, encoding=encoding)

    def _lines():
        with f:
            for line in f:
                yield line.rstrip('\n')

    return _lines()


def write_gt_list(path, records: Iterable[Record], encoding='utf8') -> int:
    """Write (image_path, label) records as TSV lines; returns the count."""
    path = Path(path)
    n = 0
    with open(path, 'w', encoding=encoding) as f:
        for fname, label in records:
            f.write(f'{fname}\t{label}\n')
            n += 1
    return n
