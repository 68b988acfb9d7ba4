"""PII detection + redaction (scale extension).

Training-data pipelines scrub personally identifiable information before
a corpus ships; this is the standard regex tier (emails, phone numbers,
IP addresses, SSN- and credit-card-shaped numbers) as pure Catalyst
expressions — the same design rules as ``quality_filters``: zero
shuffle, zero Python, counts as exact integers so a DuckDB twin can gate
values bit-for-bit.

Pattern dialect: the subset common to Java regex (Spark) and RE2
(DuckDB) — character classes, bounded repetition, ``\\b`` word
boundaries; NO lookaround/backrefs (RE2 lacks them), which is also why
the credit-card pattern requires separators (a bare 16-digit run is
indistinguishable from an id number without context we don't model).

100 TB framing: one projected scan; redaction is a fold of
``regexp_replace`` calls inside whole-stage codegen.  Emit
``pii_signals`` early in ingest so the *decision* (drop vs redact vs
keep) can be tuned without re-scanning text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered: earlier patterns are redacted first, so shapes that nest
# (credit-card before generic phone-ish digit runs) don't double-fire.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "credit_card": r"\b\d{4}[ -]\d{4}[ -]\d{4}[ -]\d{4}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    # \b goes AFTER the optional "+" / inside the alternation — a word
    # boundary can never sit between a space and "(" or "+" (both non-word)
    "phone": r"(\+?\b\d{1,2}[ .-])?(\(\d{3}\)|\b\d{3})[ .-]\d{3}[ .-]\d{4}\b",
    "ipv4": r"\b(\d{1,3}\.){3}\d{1,3}\b",
}


def pii_signals(df: DataFrame, text_col: str = "text",
                kinds: tuple[str, ...] | None = None) -> DataFrame:
    """Append ``n_<kind>`` match-count columns plus ``n_pii_total`` —
    counted on the ORIGINAL text (each kind independently, so an SSN
    inside a longer match still counts as an SSN)."""
    kinds = kinds or tuple(PII_PATTERNS)
    t = F.col(text_col)
    counts = {f"n_{k}": F.regexp_count(t, F.lit(PII_PATTERNS[k])).cast("int")
              for k in kinds}
    total = sum((c for c in counts.values()), start=F.lit(0))
    return df.withColumns({**counts, "n_pii_total": total.cast("int")})


def redact_pii(df: DataFrame, text_col: str = "text",
               kinds: tuple[str, ...] | None = None,
               out_col: str | None = None,
               token_fmt: str = "<{kind}>") -> DataFrame:
    """Replace every PII match with a typed placeholder (``<email>``,
    ``<ssn>``, …), applying patterns in ``PII_PATTERNS`` order so nested
    shapes (card → ssn → phone) resolve to the most specific kind first.
    Writes ``out_col`` (default: in place)."""
    kinds = kinds or tuple(PII_PATTERNS)
    col: Column = F.col(text_col)
    for k in PII_PATTERNS:           # dict order = precedence order
        if k in kinds:
            col = F.regexp_replace(col, F.lit(PII_PATTERNS[k]),
                                   F.lit(token_fmt.format(kind=k)))
    return df.withColumn(out_col or text_col, col)
