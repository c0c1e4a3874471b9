"""Request validation filter family F1-F6 (SURVEY.md §2.3).

The reference raises on first violation (orchestrator.py:89-234); the
engine's set-oriented form annotates every row with the FIRST failing
rule (same precedence as the reference's call order in the pydantic
validators, orchestrator.py:357-403) and splits valid/rejected.

The rule constants live here once; the DuckDB oracle SQL for the same
rules is *generated* from the same constants (``duck_reject_reason``)
so the two sides cannot drift independently.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# orchestrator.py:151 — strict character whitelist
EVENT_ID_PATTERN = "^[a-zA-Z0-9_-]+$"

# orchestrator.py:153-158 — 17 suspicious substrings (case-insensitive)
BANNED_SUBSTRINGS = [
    "script", "select", "drop", "insert", "update", "delete", "union",
    "exec", "eval", "javascript", "<", ">", '"', "'", ";", "--", "/*",
]

VALID_SOURCES = ["landfire", "modis", "weather", "topography"]  # orchestrator.py:170

# 5+ consecutive identical digits (orchestrator.py:208-211); spelled as
# 10 LIKE patterns because DuckDB's RE2 has no backreferences.
REPEAT_RUNS = [str(d) * 5 for d in range(10)]

DEFAULT_BUFFER_M = 1000  # orchestrator.py:337-343


def _decimal_str(v: Column) -> Column:
    """f"{v:.10f}".rstrip('0').rstrip('.') (orchestrator.py:190-193)."""
    s = F.format_string("%.10f", v)
    s = F.regexp_replace(s, "0+$", "")
    return F.when(s.endswith("."), F.substring(s, 1, F.length(s) - 1)).otherwise(s)


def _precision(v: Column) -> Column:
    s = _decimal_str(v)
    dot = F.instr(s, ".")
    return F.when(dot == 0, F.lit(0)).otherwise(F.length(s) - dot)


# one alternation pass instead of 10 contains() scans — keeps the
# whole-stage-codegen method small (a giant boolean chain of string
# ops can push the generated method past JVM limits and fall back to
# interpreted eval, ~10x slower); the DuckDB oracle keeps the LIKE
# chain since RE2 has no backreferences and semantics are identical
_REPEAT_RUN_RE = "|".join(REPEAT_RUNS)


def _has_repeat_run(v: Column) -> Column:
    digits = F.regexp_replace(_decimal_str(v), "[^0-9]", "")
    return digits.rlike(_REPEAT_RUN_RE)


def reject_reason(
    lat: Column,
    lon: Column,
    buffer_m: Column,
    event_id: Column,
    sources_csv: Column,
) -> Column:
    """First-failing-rule reason, or NULL if the request is valid.

    Precedence mirrors DataRequest validator order
    (orchestrator.py:357-403): coordinates -> buffer -> event_id ->
    sources -> precision.
    """
    continental = lat.between(24.5, 49.5) & lon.between(-125.0, -67.0)
    alaska = lat.between(54.0, 71.5) & (lon.between(-180.0, -130.0) | lon.between(170.0, 180.0))
    hawaii = lat.between(18.0, 29.0) & lon.between(-178.0, -154.0)

    buf = F.coalesce(buffer_m, F.lit(DEFAULT_BUFFER_M))

    # single alternation over the 17 banned literals (regex-escaped),
    # same rationale as _REPEAT_RUN_RE: one scan, small codegen
    banned_re = "|".join(re.escape(s) for s in BANNED_SUBSTRINGS)
    banned = F.lower(event_id).rlike(banned_re)

    srcs = F.split(sources_csv, ",")
    bad_source = F.exists(srcs, lambda x: ~x.isin(*VALID_SOURCES))
    dup_source = F.size(srcs) != F.size(F.array_distinct(srcs))

    return (
        # F1 — coordinate bounds + US regions (orchestrator.py:89-111)
        F.when(~lat.between(-90.0, 90.0), "latitude_out_of_range")
        .when(~lon.between(-180.0, 180.0), "longitude_out_of_range")
        .when((lat == 0) & (lon == 0), "null_island")
        .when(~(continental | alaska | hawaii), "outside_us_regions")
        # F2 — buffer size (orchestrator.py:113-129)
        .when(buf < 100, "buffer_too_small")
        .when(buf > 50000, "buffer_too_large")
        # F3 — event id (orchestrator.py:131-162); null is valid (optional)
        .when(event_id.isNotNull() & (F.length(event_id) > 100), "event_id_too_long")
        .when(event_id.isNotNull() & (F.length(event_id) < 3), "event_id_too_short")
        .when(event_id.isNotNull() & ~event_id.rlike(EVENT_ID_PATTERN), "event_id_invalid_chars")
        .when(event_id.isNotNull() & banned, "event_id_prohibited_content")
        # F4 — sources whitelist + dedup (orchestrator.py:164-184); null = all
        .when(sources_csv.isNotNull() & bad_source, "invalid_source")
        .when(sources_csv.isNotNull() & dup_source, "duplicate_sources")
        # F5 — precision + fake patterns (orchestrator.py:186-212)
        .when((_precision(lat) > 8) | (_precision(lon) > 8), "precision_too_high")
        .when(_has_repeat_run(lat) | _has_repeat_run(lon), "suspicious_coordinates")
        .otherwise(F.lit(None).cast("string"))
    )


def validate_requests(requests: DataFrame) -> DataFrame:
    """Annotate with reject_reason / is_valid (the (valid, rejected)
    splitter of SURVEY.md §2.10 'validation family')."""
    reason = reject_reason(
        F.col("latitude"),
        F.col("longitude"),
        F.col("buffer_meters"),
        F.col("event_id"),
        F.col("sources_csv"),
    )
    return requests.withColumn("reject_reason", reason).withColumn(
        "is_valid", F.col("reject_reason").isNull()
    )


# ---------------------------------------------------------------------------
# DuckDB oracle text generated from the SAME constants
# ---------------------------------------------------------------------------


def _duck_decimal_str(col: str) -> str:
    s = f"regexp_replace(printf('%.10f', {col}), '0+$', '')"
    return (
        f"(CASE WHEN {s} LIKE '%.' THEN substring({s}, 1, length({s}) - 1) ELSE {s} END)"
    )


def _duck_precision(col: str) -> str:
    s = _duck_decimal_str(col)
    return f"(CASE WHEN position('.' IN {s}) = 0 THEN 0 ELSE length({s}) - position('.' IN {s}) END)"


def _duck_repeat(col: str) -> str:
    digits = f"regexp_replace({_duck_decimal_str(col)}, '[^0-9]', '', 'g')"
    runs = " OR ".join(f"contains({digits}, '{r}')" for r in REPEAT_RUNS)
    return f"({runs})"


def duck_reject_reason() -> str:
    """The CASE expression DuckDB runs — generated from the same rule
    constants as the Spark side (expects columns latitude, longitude,
    buffer_meters, event_id, sources_csv in scope)."""
    banned = " OR ".join(
        "contains(lower(event_id), '{}')".format(s.replace("'", "''"))
        for s in BANNED_SUBSTRINGS
    )
    whitelist = ", ".join(f"'{s}'" for s in VALID_SOURCES)
    srcs = "string_split(sources_csv, ',')"
    return f"""
    CASE
      WHEN NOT (latitude BETWEEN -90.0 AND 90.0) THEN 'latitude_out_of_range'
      WHEN NOT (longitude BETWEEN -180.0 AND 180.0) THEN 'longitude_out_of_range'
      WHEN latitude = 0 AND longitude = 0 THEN 'null_island'
      WHEN NOT (
            (latitude BETWEEN 24.5 AND 49.5 AND longitude BETWEEN -125.0 AND -67.0)
         OR (latitude BETWEEN 54.0 AND 71.5 AND
             (longitude BETWEEN -180.0 AND -130.0 OR longitude BETWEEN 170.0 AND 180.0))
         OR (latitude BETWEEN 18.0 AND 29.0 AND longitude BETWEEN -178.0 AND -154.0)
      ) THEN 'outside_us_regions'
      WHEN coalesce(buffer_meters, {DEFAULT_BUFFER_M}) < 100 THEN 'buffer_too_small'
      WHEN coalesce(buffer_meters, {DEFAULT_BUFFER_M}) > 50000 THEN 'buffer_too_large'
      WHEN event_id IS NOT NULL AND length(event_id) > 100 THEN 'event_id_too_long'
      WHEN event_id IS NOT NULL AND length(event_id) < 3 THEN 'event_id_too_short'
      WHEN event_id IS NOT NULL AND NOT regexp_matches(event_id, '{EVENT_ID_PATTERN}')
           THEN 'event_id_invalid_chars'
      WHEN event_id IS NOT NULL AND ({banned}) THEN 'event_id_prohibited_content'
      WHEN sources_csv IS NOT NULL AND
           len(list_filter({srcs}, x -> x NOT IN ({whitelist}))) > 0 THEN 'invalid_source'
      WHEN sources_csv IS NOT NULL AND
           len({srcs}) != len(list_distinct({srcs})) THEN 'duplicate_sources'
      WHEN {_duck_precision('latitude')} > 8 OR {_duck_precision('longitude')} > 8
           THEN 'precision_too_high'
      WHEN {_duck_repeat('latitude')} OR {_duck_repeat('longitude')}
           THEN 'suspicious_coordinates'
      ELSE NULL
    END
    """
