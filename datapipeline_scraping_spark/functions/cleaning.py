"""Cleaning/normalization scalar functions (P12-P17 in SURVEY.md §2.2).

All are built-in-expression compositions — JVM-side, codegen-friendly,
no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def nullif_empty(col: Column | str) -> Column:
    """Empty-or-whitespace string -> NULL (P15; reference:
    ``src/storage.py:149-152``)."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.trim(c)
    return F.when(t == F.lit(""), F.lit(None).cast(T.StringType())).otherwise(t)


def normalize_empty_to_null(df: DataFrame) -> DataFrame:
    """Apply :func:`nullif_empty` to every string column, as the
    reference does at the final store (``src/storage.py:146-152``)."""
    out = df
    for f in df.schema.fields:
        if isinstance(f.dataType, T.StringType):
            out = out.withColumn(f.name, nullif_empty(f.name))
    return out


def trim_keys(df: DataFrame, key: str) -> DataFrame:
    """Trim the lookup key and drop rows where it is empty (P12;
    reference: ``dags/processing_etl.py:64-69``)."""
    return df.withColumn(key, F.trim(F.col(key))).filter(F.col(key) != "")


def absolutize_url(href: Column | str, domain: str) -> Column:
    """`urljoin`-lite: prefix relative hrefs with the domain (P17;
    reference: ``src/scrapers/list_parser.py:65``)."""
    c = F.col(href) if isinstance(href, str) else href
    return F.when(c.startswith("http"), c).otherwise(
        F.concat(F.lit(domain.rstrip("/") + "/"), F.regexp_replace(c, "^/", ""))
    )


def force_https(url: Column | str) -> Column:
    """HTTP -> HTTPS upgrade (P11; reference:
    ``src/scrapers/detail_parser.py:102-106``)."""
    c = F.col(url) if isinstance(url, str) else url
    return F.regexp_replace(c, "^http:", "https:")


def parse_date(col: Column | str, fmt: str = "yyyy-MM-dd") -> Column:
    """Text -> DATE at the sink boundary (P16; reference formats: ISO
    for Colombia, dd/MM/yyyy for Peru — ``configs/*.yml``). Uses
    try_to_date-style null-on-garbage semantics (ANSI-safe)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.try_to_timestamp(c, F.lit(fmt)).cast(T.DateType())
