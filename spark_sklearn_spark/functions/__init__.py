"""Reusable column-expression library (JVM-side, codegen-friendly).

Queries and operators compose these instead of re-deriving the same
expression trees; everything here returns a Column and never touches
Python row-at-a-time execution.
"""

from .text import tokens, token_count, stopword_ratio, lang_scores  # noqa: F401
from .vectors import as_double_array, sq_norm, unit, cosine  # noqa: F401
