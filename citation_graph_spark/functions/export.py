"""Export-side helpers (SURVEY.md C10/C11).

The reference sanitizes graph-output filenames and renders pyvis hover
tables on the driver (``src/citation_graph/utils.py:32-33`` and
``utils.py:84-97``). Both are export-side (they run on tiny, collected
data), so the python forms are the primary API; ``valid_filename_col`` is
the same sanitizer as a column expression for writing per-partition file
labels JVM-side.

Semantics (reference parity, verified in tests/test_functions.py):

- ``valid_filename``: every run of characters outside
  ``[\\w\\d _\\-,\\.+()]`` collapses to a single ``-`` (unicode ``\\w``,
  like Python's ``re``).
- ``create_html_table``: rows → ``<table>`` string; short rows are padded
  with empty ``<td></td>`` cells up to the widest row.
"""

from __future__ import annotations

import re
from collections.abc import Iterable, Sequence
from typing import Any

from pyspark.sql import Column, functions as F

_NON_FILENAME = re.compile(r"[^\w\d _\-,\.+()]+")
# Java regex defaults \w to ASCII; (?U) makes it unicode-aware like Python's
_NON_FILENAME_JAVA = r"(?U)[^\w\d _\-,\.+()]+"


def valid_filename(name: str) -> str:
    """Driver-side sanitizer — reference ``get_valid_filename``."""
    return _NON_FILENAME.sub("-", name)


def valid_filename_col(name: Column) -> Column:
    """Same sanitizer as a column expression (JVM regexp_replace)."""
    return F.regexp_replace(name, _NON_FILENAME_JAVA, "-")


def create_html_table(table: Iterable[Sequence[Any]]) -> str:
    """Rows → one ``<table>`` HTML string, short rows padded to the widest
    row with empty cells — reference ``create_html_table``."""
    rows = list(table)
    width = max((len(r) for r in rows), default=0)
    parts = ["<table>"]
    for row in rows:
        parts.append("<tr>")
        parts.extend(f"<td>{c}</td>" for c in row)
        parts.extend(["<td></td>"] * (width - len(row)))
        parts.append("</tr>")
    parts.append("</table>")
    return "".join(parts)
