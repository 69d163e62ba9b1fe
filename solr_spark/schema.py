"""Schema machinery: dynamicField patterns, copyField fan-out, and
light schemaless type inference — the ingest shim in front of
indexer.build_index.

Reference semantics:
- dynamicField: a field name matches a pattern with exactly one ``*``
  at the start or end (``*_txt``, ``attr_*``); the LONGEST matching
  pattern wins, exact field declarations always win over patterns
  (solr/core/src/java/org/apache/solr/schema/IndexSchema.java
  dynamicFieldListWithDuplicates ordering — longest first).
- copyField: every source field matching the pattern has its value
  appended to the destination field (DocumentBuilder.java:183-224 —
  copyField targets accumulate multiple values; with a string
  catch-all the accumulated values join on a single space, in the
  source frame's column order, which is this engine's documented
  stand-in for Lucene's multiValued concatenation).
- schemaless: unknown columns get a type from their Spark type — the
  AddSchemaFieldsUpdateProcessorFactory.java:1 typeMappings table
  reduced to the engine's type set.

Everything here is a NARROW projection/cast transform on the frame —
no shuffle, no UDF; Catalyst folds it into the scan.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# engine type name -> Spark cast target (None = leave as-is, analyzed
# downstream by the index analyzer chain)
TYPE_CASTS: dict[str, "str | None"] = {
    "string": "string",     # StrField: stored verbatim, exact match
    "text": "string",       # TextField: analyzed at build time
    "text_general": "string",
    "pint": "int",
    "plong": "bigint",
    "pdouble": "double",
    "pfloat": "float",
    "boolean": "boolean",
    "pdate": "timestamp",
}


def pattern_matches(name: str, pattern: str) -> bool:
    """Solr's dynamicField glob: one ``*`` at the start OR end (or the
    bare ``*`` catch-all)."""
    if pattern == "*":
        return True
    if pattern.startswith("*"):
        return name.endswith(pattern[1:])
    if pattern.endswith("*"):
        return name.startswith(pattern[:-1])
    return name == pattern


@dataclass
class SchemaSpec:
    """fields: exact name -> type; dynamic_fields: pattern -> type;
    copy_fields: (source pattern, dest field) in declaration order."""

    fields: dict[str, str] = field(default_factory=dict)
    dynamic_fields: dict[str, str] = field(default_factory=dict)
    copy_fields: list[tuple[str, str]] = field(default_factory=list)

    def type_of(self, name: str) -> "str | None":
        """Exact declaration wins; else the LONGEST matching dynamic
        pattern (IndexSchema's ordering); None = undeclared."""
        if name in self.fields:
            return self.fields[name]
        best = None
        for pat, typ in self.dynamic_fields.items():
            if pattern_matches(name, pat):
                if best is None or len(pat) > len(best[0]):
                    best = (pat, typ)
        return best[1] if best else None


# Spark type -> engine type (the schemaless typeMappings table)
_INFER = {
    "string": "text_general",
    "int": "pint", "bigint": "plong",
    "double": "pdouble", "float": "pfloat",
    "boolean": "boolean", "timestamp": "pdate",
}


def infer_schema(df: DataFrame, spec: SchemaSpec) -> dict[str, str]:
    """Schemaless inference: for every column the spec does NOT cover,
    derive a type from the Spark type (AddSchemaFieldsUpdateProcessor).
    Returns {column: inferred type} for the uncovered columns only."""
    out: dict[str, str] = {}
    for f_ in df.schema.fields:
        if spec.type_of(f_.name) is None:
            out[f_.name] = _INFER.get(f_.dataType.simpleString(), "string")
    return out


def apply_schema(
    df: DataFrame, spec: SchemaSpec, schemaless: bool = True
) -> DataFrame:
    """The ingest shim: resolve every column's type (exact > dynamic >
    inferred), cast accordingly, then run the copyField fan-out —
    dest := concat_ws(' ', existing dest?, matching sources in column
    order). Strict mode (schemaless=False) raises on undeclared
    columns, mirroring a managed schema with schemaless ingest off."""
    inferred = infer_schema(df, spec)
    if not schemaless and inferred:
        raise ValueError(
            f"undeclared fields {sorted(inferred)} (schemaless=False; "
            "declare them or add a dynamicField pattern)"
        )
    cols = []
    for f_ in df.schema.fields:
        typ = spec.type_of(f_.name) or inferred.get(f_.name, "string")
        cast = TYPE_CASTS.get(typ)
        if cast is None:
            raise ValueError(f"unknown schema type {typ!r} for {f_.name}")
        c = F.col(f_.name)
        if f_.dataType.simpleString() != cast:
            c = c.cast(cast)
        cols.append(c.alias(f_.name))
    out = df.select(*cols)
    for pat, dest in spec.copy_fields:
        sources = [
            f_.name for f_ in df.schema.fields
            if pattern_matches(f_.name, pat) and f_.name != dest
        ]
        if not sources:
            continue
        parts = ([F.col(dest)] if dest in out.columns else []) + [
            F.col(s).cast("string") for s in sources
        ]
        out = out.withColumn(dest, F.concat_ws(" ", *parts))
    return out
