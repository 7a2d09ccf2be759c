"""Author-name formatting and parsing.

Reference semantics:
- ``get_authors_str`` (``paper.py:50-65``): long form joins
  "F L" strings — "A", "A and B", "A, B and C-style (comma list + ' and ' +
  last)"; short form uses lastnames — "L", "L1 and L2", "L1 et al." for >2.
- provider name split (``semantic_scholar.py:132-138``):
  ``name.split(" ", 1)`` → forename = first token, lastname = remainder
  (the whole name when there is no space).

Authors are ``array<struct<forename:string, lastname:string>>`` — all
expressions below are built-in array/string functions (no UDF).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def authors_str(authors: Column, short: bool = False) -> Column:
    if short:
        names = F.transform(authors, lambda a: a["lastname"])
    else:
        names = F.transform(
            authors, lambda a: F.concat_ws(" ", a["forename"], a["lastname"])
        )
    n = F.size(authors)
    first = F.element_at(names, 1)
    last = F.element_at(names, -1)
    two = F.concat(first, F.lit(" and "), last)
    if short:
        many = F.concat(first, F.lit(" et al."))
    else:
        many = F.concat(
            F.array_join(F.slice(names, 1, n - 1), ", "), F.lit(" and "), last
        )
    return (
        F.when(n > 2, many)
        .when(n == 2, two)
        .when(n == 1, first)
        .otherwise(F.lit(""))
    )


def split_author_name(name: Column) -> Column:
    """"Ada M. Lovelace" → struct(forename="Ada", lastname="M. Lovelace");
    no-space names put the whole string in both fields' first token rule:
    forename = token 1, lastname = remainder-or-whole (split(" ", 1)[-1])."""
    parts = F.split(name, " ", 2)
    forename = F.element_at(parts, 1)
    lastname = F.element_at(parts, -1)
    return F.struct(forename.alias("forename"), lastname.alias("lastname"))
