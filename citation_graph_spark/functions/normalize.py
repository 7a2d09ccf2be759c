"""Title normalization and fuzzy title resemblance.

Reference semantics (``/root/reference/src/citation_graph/paper.py:203-224``,
regexes at ``paper.py:12-13``):

    normalize(title) = punct_ws_runs -> " " ( latex_math -> "" (
                           ascii_fold(title) )).lower()
    resemble(t1, t2) = levenshtein(n1, n2) < ceil(0.05 * min(len(n1), len(n2)))
                       (strictly less; lengths of the NORMALIZED titles)

The ascii fold (reference uses ``unidecode``) is the only non-JVM step: a
vectorized pandas UDF doing NFKD decomposition + combining-mark removal +
a small table for non-decomposable Latin letters (ß→ss, æ→ae, …). Covers
the Latin-script corpus the reference's own tests exercise
(``tests/test_paper.py:83-85``: "Meikäläinen" etc.); exotic scripts fall
back to dropping non-ASCII, which is also what matters for the blocked
dedup join. Everything downstream of the fold — LaTeX strip, punctuation
collapse, lowercase, ``levenshtein`` — is built-in Catalyst expressions.
"""

from __future__ import annotations

import math
import re
import unicodedata

import pandas as pd
from pyspark.sql import Column, functions as F, types as T

# Same character class as the reference's PUNCTUATION_REG (paper.py:12).
PUNCT_RE = r"[°^!\"§%&/()\[\]=\{\}?*+~'#,;.:\-_\s]+"
LATEX_MATH_RE = r"\$[^\$]*\$"
RESEMBLE_FACTOR = 0.05

_FOLD_TABLE = str.maketrans(
    {
        "ß": "ss", "ẞ": "SS", "æ": "ae", "Æ": "AE", "œ": "oe", "Œ": "OE",
        "ø": "o", "Ø": "O", "đ": "d", "Đ": "D", "ð": "d", "Ð": "D",
        "þ": "th", "Þ": "Th", "ł": "l", "Ł": "L", "ħ": "h", "Ħ": "H",
        "ı": "i", "ĸ": "k", "ŋ": "ng", "Ŋ": "NG", "ŧ": "t", "Ŧ": "T",
        "—": "-", "–": "-", "‘": "'", "’": "'", "“": '"', "”": '"',
    }
)


def ascii_fold_py(text: str | None) -> str | None:
    """Pure-python fold shared by the UDF and the test oracle."""
    if text is None:
        return None
    text = text.translate(_FOLD_TABLE)
    decomposed = unicodedata.normalize("NFKD", text)
    return "".join(c for c in decomposed if ord(c) < 128)


@F.pandas_udf(T.StringType())
def ascii_fold(s: pd.Series) -> pd.Series:
    return s.map(ascii_fold_py, na_action="ignore")


def normalize_title(title: Column) -> Column:
    """Column expression for the reference's ``_normalize_title``."""
    folded = ascii_fold(title)
    no_math = F.regexp_replace(folded, LATEX_MATH_RE, "")
    no_punct = F.regexp_replace(no_math, PUNCT_RE, " ")
    return F.lower(no_punct)


def titles_resemble(title1: Column, title2: Column) -> Column:
    """Boolean column: fuzzy title match per ``paper.py:213-224``."""
    n1 = normalize_title(title1)
    n2 = normalize_title(title2)
    threshold = F.ceil(
        F.least(F.length(n1), F.length(n2)) * F.lit(RESEMBLE_FACTOR)
    )
    return F.levenshtein(n1, n2) < threshold


# ----------------------- python oracles (tests) -----------------------------

_PUNCT_RE_PY = re.compile(PUNCT_RE)
_LATEX_RE_PY = re.compile(LATEX_MATH_RE)


def normalize_title_py(title: str) -> str:
    return _PUNCT_RE_PY.sub(" ", _LATEX_RE_PY.sub("", ascii_fold_py(title))).lower()


def titles_resemble_py(t1: str, t2: str) -> bool:
    n1, n2 = normalize_title_py(t1), normalize_title_py(t2)
    threshold = math.ceil(min(len(n1), len(n2)) * RESEMBLE_FACTOR)
    return _levenshtein(n1, n2) < threshold


def _levenshtein(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]
