"""Unicode normalization kernels — canonical keys ahead of dedup.

Kept in their own module (not text.py) so the per-round driver
certification closure stays minimal: gates importing the big text
toolbox are not re-flagged when a normalizer changes, and vice versa.
Reference scope: no text tier in the reference engine (SURVEY.md
§2.5); north-star extension.
"""

import pandas as pd
from pyspark.sql import Column


def nfc_normalize(text: Column) -> Column:
    """Unicode NFC normalization — composes decomposed sequences
    (e + COMBINING ACUTE -> é) so that visually-identical strings
    compare, hash, and dedup as equal.  Standard ahead of any
    fingerprint/dedup key on web text: crawls mix composed and
    decomposed forms freely (macOS filenames, some CMSes emit NFD).

    Arrow-batched pandas UDF over ``unicodedata.normalize`` — there is
    no JVM-side builtin; the kernel is map-side, vectorized transfer,
    no shuffle.  NULL in -> NULL out."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(
            lambda v: unicodedata.normalize("NFC", v)
            if v is not None else None
        )

    return _nfc(text)


def nfkc_casefold(text: Column) -> Column:
    """NFKC + casefold — the aggressive canonical key for exact dedup
    and URL/anchor matching: compatibility forms collapse (ﬁ -> fi,
    fullwidth -> ASCII, ² -> 2) and case differences vanish under
    full Unicode casefolding (ß -> ss).  Use for KEYS, not for the
    stored text (NFKC is lossy by design).  Same map-side Arrow
    kernel shape as ``nfc_normalize``."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _nfkc_cf(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(
            lambda v: unicodedata.normalize("NFKC", v).casefold()
            if v is not None else None
        )

    return _nfkc_cf(text)
