"""Semi-structured (JSON string column) extraction — the event-props /
API-payload pattern: a VARCHAR column carrying small JSON objects whose
typed fields downstream queries filter and aggregate on.

``from_json`` parses each value ONCE into a typed struct JVM-side
(whole-stage codegen, no UDF); projecting k fields from the struct is
free, unlike k ``get_json_object`` calls which re-parse the string k
times. Malformed JSON yields NULL fields (PERMISSIVE), so bad payloads
degrade to NULLs instead of failing the job under ANSI mode. At 100 TB
the parse is a narrow row-local map fused into the scan — no shuffle —
and unused fields are pruned from the struct by Catalyst when consumers
only touch a subset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def json_fields(
    df: DataFrame,
    json_col: str,
    fields: dict[str, str],
    keep: list[str] | None = None,
) -> DataFrame:
    """Extract typed ``fields`` (name -> Spark SQL type string) from the
    JSON string in ``json_col``, keeping ``keep`` passthrough columns.
    One parse per row; absent/malformed fields come back NULL."""
    schema = ", ".join(f"{name} {typ}" for name, typ in fields.items())
    parsed = F.from_json(F.col(json_col), schema)
    keep = keep if keep is not None else [c for c in df.columns if c != json_col]
    return df.select(
        *keep, *[parsed[name].alias(name) for name in fields]
    )
