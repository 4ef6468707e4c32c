"""Schema registry + DataFrame contract checks.

Re-expresses the reference's two-layer declarative schema system
(config/db_schema.yaml + config/data_integration.yaml, validated by
workflow/scripts/utils/qc.py:18-99) as a ``StructType`` registry and a
contract-check function. The reference's checks, mapped:

- required columns must exist            (qc.py:50-60)  -> ``required ⊆ df.columns``
- every df column must be declared       (qc.py:63-69)  -> ``df.columns ⊆ schema``
- dtype equivalence-group comparison     (qc.py:18-34)  -> cast-or-fail to declared type
- unique index property                  (qc.py:74-84)  -> groupBy(key).count()>1 assert

Unlike the reference (which reads everything as ``dtype=str`` and repairs
``.0`` drift at merge time — merge_sources.py:119-128, general.py:258-262),
this engine keeps real Spark types end-to-end.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Engine-native schemas (BASELINE.json input_hint)
# ---------------------------------------------------------------------------

#: Target lake table of Common-Crawl-style web pages.
PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),  # primary key
        T.StructField("warc_ts", T.TimestampType(), False),  # LWW key 1
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),  # added mid-replay in evolution tests
    ]
)

#: Change-event (binlog/WAL analog) schema. ``event_seq`` is globally
#: monotone: LWW tiebreak + idempotence key together with ``url``.
CHANGE_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_seq", T.LongType(), False),
        T.StructField("op", T.StringType(), False),  # insert | update | delete
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), True),  # null for deletes
    ]
)

OPS = ("insert", "update", "delete")


@dataclass
class TableContract:
    """Declarative per-table contract (analog of one db_schema.yaml label).

    ``key`` is the unique index property (ref: db_schema.yaml ``index`` +
    qc.py:74-84); ``required`` the non-null columns (qc.py:50-60).
    """

    name: str
    schema: T.StructType
    key: str | None = None
    required: list[str] = field(default_factory=list)

    @property
    def columns(self) -> list[str]:
        return [f.name for f in self.schema.fields]


class ContractError(ValueError):
    pass


def check_contract(df: DataFrame, contract: TableContract, *, check_unique: bool = True) -> DataFrame:
    """Validate ``df`` against ``contract``; returns the conformed DataFrame.

    Mirrors the reference's df_check (qc.py:86-99) but fails fast on type
    mismatches instead of warning, and conforms column order/types by cast.
    """
    cols = set(df.columns)
    missing = [c for c in contract.required if c not in cols]
    if missing:
        raise ContractError(f"{contract.name}: missing required columns {missing}")
    declared = set(contract.columns)
    undeclared = sorted(cols - declared)
    if undeclared:
        raise ContractError(f"{contract.name}: undeclared columns {undeclared}")

    # conform: add missing optional columns as NULL, cast to declared types
    out = df
    for f_ in contract.schema.fields:
        if f_.name not in cols:
            out = out.withColumn(f_.name, F.lit(None).cast(f_.dataType))
        else:
            out = out.withColumn(f_.name, F.col(f_.name).cast(f_.dataType))
    out = out.select(*contract.columns)

    if check_unique and contract.key:
        dupes = (
            out.groupBy(contract.key)
            .count()
            .filter(F.col("count") > 1)
            .limit(5)
            .collect()
        )
        if dupes:
            # analog of qc.py:82 value_counts diagnostic on abort
            sample = {r[contract.key]: r["count"] for r in dupes}
            raise ContractError(f"{contract.name}: duplicate keys (sample): {sample}")
    return out


#: lossless integer-widening ladder (Iceberg's int->long rule, extended
#: down the integral chain)
_INT_WIDTH = {T.ByteType: 0, T.ShortType: 1, T.IntegerType: 2, T.LongType: 3}


def widens(old: T.DataType, new: T.DataType) -> bool:
    """True iff ``new`` is a safe (lossless) widening of ``old`` — the
    Iceberg evolution rules: integral up-casts, float->double, and
    decimal growth that loses neither scale nor integer digits. Spark
    4.x's parquet reader natively reads old files through the widened
    schema (verified in tests), so no file rewrite is needed."""
    if type(old) in _INT_WIDTH and type(new) in _INT_WIDTH:
        return _INT_WIDTH[type(new)] > _INT_WIDTH[type(old)]
    if isinstance(old, T.FloatType) and isinstance(new, T.DoubleType):
        return True
    if isinstance(old, T.DecimalType) and isinstance(new, T.DecimalType):
        return (new.scale >= old.scale
                and new.precision - new.scale >= old.precision - old.scale
                and (new.precision, new.scale) != (old.precision, old.scale))
    return False


def merge_schemas(base: T.StructType, incoming: T.StructType) -> T.StructType:
    """Additive + widening schema union: base fields keep position;
    net-new incoming fields are appended as nullable; a field arriving
    with a safely WIDER type (int->long, float->double, decimal growth)
    widens the table schema in place — old files read through the wider
    schema without rewrite. A NARROWER arrival keeps the table type (the
    merge path up-casts the batch). Any other type change is rejected
    (Iceberg's safe-evolution rules)."""
    by_name = {f.name: f for f in base.fields}
    out = list(base.fields)
    for f_ in incoming.fields:
        if isinstance(f_.dataType, T.NullType):
            # an all-null column (e.g. a delete-only batch's html) carries
            # no type information — defer to the declared type, or skip a
            # net-new column until a typed value arrives
            continue
        if f_.name in by_name:
            existing = by_name[f_.name].dataType
            if isinstance(existing, T.NullType):
                i = next(idx for idx, x in enumerate(out) if x.name == f_.name)
                out[i] = T.StructField(f_.name, f_.dataType, True)
            elif existing != f_.dataType:
                if widens(existing, f_.dataType):
                    i = next(idx for idx, x in enumerate(out)
                             if x.name == f_.name)
                    out[i] = T.StructField(f_.name, f_.dataType, True)
                elif widens(f_.dataType, existing):
                    pass  # narrower batch: caller conforms by up-cast
                else:
                    raise ContractError(
                        f"schema evolution: incompatible type change for "
                        f"'{f_.name}': {existing} -> {f_.dataType}"
                    )
        else:
            out.append(T.StructField(f_.name, f_.dataType, True))
    return T.StructType(out)
