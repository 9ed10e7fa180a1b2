"""Text normalization and tokenization expressions.

One canonical normal form shared by fingerprinting / minhash / simhash /
n-gram dedup — if two operators normalized differently, "duplicate" would
mean different things per operator and cluster results would disagree.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def norm_text(col: Column) -> Column:
    """Lowercase, strip non-alphanumerics (keep spaces) — the canonical form
    shared by fingerprint / minhash / simhash."""
    return F.regexp_replace(F.lower(col), "[^a-z0-9 ]", "")


NORM_TEXT_SQL = "regexp_replace(lower({col}), '[^a-z0-9 ]', '', 'g')"


def tokens(col: Column) -> Column:
    """Whitespace tokens of the normalized text."""
    return F.split(norm_text(col), r"\s+")
