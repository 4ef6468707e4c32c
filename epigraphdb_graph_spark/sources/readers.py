"""Source readers — the reference's scan inventory (SURVEY.md §2.1), Spark-first.

Each reader mirrors one scan shape found in the reference's 67 processing
scripts, as a thin declarative wrapper over ``spark.read`` so Catalyst
keeps pushdown/pruning:

- S1 delimited scan with the reference's variant knobs (sep, gzip
  transparent, comment-skip, malformed-drop): ``read_delimited``
  (ref: pd.read_csv calls, e.g. processing/nodes/gwas/opengwas.py:29,
  rels/variant_to_gene.py:49, nodes/drug/cpic.py:29)
- S2 headerless scan + schema-by-position: ``read_headerless``
  (ref: create_df, utils/general.py:248-262 — but typed, not dtype=str)
- S3 JSON document scan + record explode: ``read_json_records``
  (ref: Mondo ontology walk, nodes/disease/mondo.py:52-91)
- S8 wide-matrix scan + unpivot to long: ``read_wide_matrix``
  (ref: GTEx GCT melt, rels/tissue-gene-gtex.py:29-41)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_delimited(
    spark: SparkSession,
    path: str,
    *,
    sep: str = ",",
    header: bool = True,
    schema: T.StructType | None = None,
    comment: str | None = None,
    drop_malformed: bool = False,
) -> DataFrame:
    """Delimited scan covering the reference's pd.read_csv variants.
    gzip is transparent (as in pandas); ``drop_malformed`` maps
    error_bad_lines=False. (skiprows only ever appears in the reference's
    wide-matrix GCT scan — handled in read_wide_matrix.)"""
    reader = (
        spark.read.option("sep", sep)
        .option("header", str(header).lower())
    )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    if comment:
        reader = reader.option("comment", comment)
    if drop_malformed:
        reader = reader.option("mode", "DROPMALFORMED")
    return reader.csv(path)


def read_headerless(
    spark: SparkSession,
    path: str,
    columns: list[str] | T.StructType,
    *,
    sep: str = ",",
    usecols: list[str] | None = None,
) -> DataFrame:
    """Headerless scan with schema-by-position (ref create_df,
    utils/general.py:248-262). Unlike the reference's dtype=str read, a
    typed StructType keeps real types end-to-end; passing a plain name
    list falls back to all-string (the reference's exact behavior)."""
    if isinstance(columns, T.StructType):
        schema = columns
    else:
        schema = T.StructType(
            [T.StructField(c, T.StringType(), True) for c in columns]
        )
    df = spark.read.schema(schema).option("sep", sep).option("header", "false").csv(path)
    if usecols:
        df = df.select(*usecols)  # column pruning reaches the scan
    return df


def read_json_records(
    spark: SparkSession,
    path: str,
    record_path: str,
    *,
    multi_line: bool = True,
) -> DataFrame:
    """Whole-document JSON scan + explode of a nested record array
    (ref Mondo: graphs[0].nodes — nodes/disease/mondo.py:52-55).
    ``record_path`` like ``"graphs[0].nodes"``; returns one row per
    record with the record struct in column ``record``."""
    df = spark.read.option("multiLine", str(multi_line).lower()).json(path)
    # resolve a simple a[i].b[...] path
    cur = None
    for part in record_path.replace("]", "").replace("[", ".").split("."):
        if cur is None:
            cur = F.col(part)
        elif part.isdigit():
            cur = cur.getItem(int(part))
        else:
            cur = cur.getField(part)
    return df.select(F.explode(cur).alias("record"))


def read_wide_matrix(
    spark: SparkSession,
    path: str,
    *,
    id_cols: list[str],
    var_name: str = "variable",
    value_name: str = "value",
    sep: str = "\t",
    skip_rows: int = 0,
    value_type: str = "double",
) -> DataFrame:
    """Wide matrix -> long triples (ref GTEx GCT melt: 2 metadata lines
    skipped, tissues as columns — nodes/tissue/gtex.py:28-34,
    rels/tissue-gene-gtex.py:29-41): skip the metadata prefix, take the
    next line as the header, ``unpivot`` every non-id column. unpivot is
    a zero-shuffle narrow op. The prefix skip needs a *true* line index:
    ``zipWithIndex`` (one extra partition-count job) — NOT
    monotonically_increasing_id, whose ids jump 2^33 per partition and
    only order correctly if the prefix happens to land in partition 0."""
    if skip_rows == 0:
        df = read_delimited(spark, path, sep=sep, header=True)
    else:
        txt = (
            spark.read.text(path)
            .rdd.zipWithIndex()
            .toDF(["_row", "_rn"])
            .select(F.col("_row.value").alias("value"), "_rn")
        )
        hdr_line = (
            txt.filter(F.col("_rn") >= skip_rows).orderBy("_rn").first()["value"]
        )
        names = hdr_line.split(sep)
        ddl = ", ".join(f"`{n}` STRING" for n in names)
        df = (
            txt.filter(F.col("_rn") > skip_rows)
            .select(F.from_csv("value", ddl, {"sep": sep}).alias("r"))
            .select("r.*")
        )
    value_cols = [c for c in df.columns if c not in id_cols]
    out = df.unpivot(id_cols, value_cols, var_name, value_name)
    return out.withColumn(value_name, F.col(value_name).cast(value_type))


# ---------------------------------------------------------------------------
# S5: graph-database scan — the reference's bulk-import interchange format.
# ---------------------------------------------------------------------------

#: neo4j-admin header type -> Spark cast target (scalar part)
_NEO4J_TYPES = {
    "int": "long",
    "long": "long",
    "float": "double",
    "double": "double",
    "boolean": "boolean",
    "string": "string",
    "datetime": "timestamp",
    "date": "date",
}

#: reserved (property-less) header fields -> synthetic column names
_NEO4J_RESERVED = {"LABEL": "_label", "TYPE": "_type"}


def parse_graph_header(line: str, sep: str = ",") -> list[dict]:
    """Parse one neo4j-admin import header line into column specs.

    The reference emits headers like
    ``id:ID(Gwas-ID),year:int,_source:string[]`` for nodes and
    ``:START_ID(Gwas-ID),:END_ID(Variant-ID),beta:float`` for rels
    (workflow/scripts/utils/writers.py:150-190). Each spec carries the
    field name the property keeps in the scan, the Spark type to cast
    to, whether it is an array (``type[]`` — ';'-delimited in the data
    file), and its graph role (``id``/``start_id``/``end_id``/
    ``label``/``type``/``property``) plus the id-space tag from the
    parenthesised group.
    """
    specs = []
    for raw in line.strip().split(sep):
        name, _, typ = raw.partition(":")
        id_space = None
        if "(" in typ:
            typ, _, grp = typ.partition("(")
            id_space = grp.rstrip(")") or None
        typ = typ.strip()
        is_array = typ.endswith("[]")
        scalar = typ[:-2] if is_array else typ
        if scalar in ("ID", "START_ID", "END_ID"):
            role = scalar.lower()
            cast = "string"  # id spaces are opaque strings in the import
            name = name or {"ID": "_id", "START_ID": "_start_id",
                            "END_ID": "_end_id"}[scalar]
        elif scalar in _NEO4J_RESERVED:
            role = scalar.lower()
            cast = "string"
            name = name or _NEO4J_RESERVED[scalar]
        else:
            role = "property"
            cast = _NEO4J_TYPES.get(scalar, "string")
        specs.append(
            {"name": name, "cast": cast, "array": is_array,
             "role": role, "id_space": id_space}
        )
    return specs


def read_graph_import(
    spark: SparkSession,
    data_path: str,
    header_path: str,
    *,
    sep: str = ",",
    array_delimiter: str = ";",
) -> DataFrame:
    """S5 graph-database scan: read a neo4j-admin bulk-import pair
    (separate one-line ``.header`` file + headerless ``.csv[.gz]`` data,
    the exact layout the reference's create_import emits and its
    ``neo4j-admin import`` consumes —
    workflow/scripts/graph_build/create_master_import.py:74,
    utils/writers.py:186-190).

    The header is one tiny driver-side read; the data file is a normal
    schema-by-position CSV scan (pushdown/pruning intact, gzip
    transparent), then one projection casts every property to its
    declared type and splits ``type[]`` arrays on the neo4j array
    delimiter. Column order, names, and graph roles (ID / START_ID /
    END_ID) follow the header, so round-tripping the reference's import
    directories yields typed DataFrames without any Neo4j instance.
    """
    hdr = (
        spark.read.text(header_path)
        .limit(1)
        .collect()[0]["value"]
    )
    specs = parse_graph_header(hdr, sep=sep)
    raw = read_headerless(
        spark, data_path, [s["name"] for s in specs], sep=sep
    )
    cols = []
    for s in specs:
        c = F.col(s["name"])
        if s["array"]:
            c = F.when(
                c.isNotNull(),
                F.transform(
                    F.split(c, array_delimiter),
                    lambda x: x.cast(s["cast"]),
                ),
            )
        else:
            c = c.cast(s["cast"])
        cols.append(c.alias(s["name"]))
    return raw.select(*cols)


def columns_as_rows(
    df: DataFrame,
    *,
    skip: int = 0,
    name: str = "col",
    ordinal: str = "ordinal",
) -> DataFrame:
    """R4 columns->rows: derive an entity table from a frame's *column
    names* (ref GTEx tissue nodes = matrix header names,
    nodes/tissue/gtex.py:31-35). Schema introspection is driver-side
    metadata — no Spark job touches the data; the result is a tiny
    local relation (broadcast-join fodder) with the original column
    position preserved in ``ordinal``.
    """
    rows = [(i, c) for i, c in enumerate(df.columns)][skip:]
    return df.sparkSession.createDataFrame(
        rows, f"{ordinal} int, {name} string"
    )


# ---------------------------------------------------------------------------
# S6: MySQL-dump scan — INSERT statements -> typed rows, no MySQL server.
# ---------------------------------------------------------------------------

_MYSQL_ESCAPES = {
    "0": "\0", "'": "'", '"': '"', "b": "\b", "n": "\n",
    "r": "\r", "t": "\t", "Z": "\x1a", "\\": "\\", "%": "%", "_": "_",
}


def parse_insert_values(payload: str) -> list[list[str | None]]:
    """Parse the ``(...),(...)`` payload of a MySQL ``INSERT`` statement
    into rows of raw values (``None`` for SQL NULL).

    A single character scan handles single-quoted strings with backslash
    escapes and ``''`` doubling — the two quoting forms mysqldump emits —
    so embedded commas, parens, and quotes in string values are safe
    (the failure modes of a naive ``split("),(")``). Pure function:
    unit-testable without Spark, shared by the executor-side batches.
    (Behavioral reference: workflow/scripts/source/mysql_to_csv.py:38-95,
    which streams the same payloads through a csv.reader trick.)
    """
    rows, cur, val = [], [], []
    i, n, in_row, in_str = 0, len(payload), False, False
    quoted = False  # value came from a quoted string: verbatim, never NULL

    def finish():
        s = "".join(val)
        if quoted:
            return s
        s = s.strip()
        return None if s.upper() == "NULL" else s

    while i < n:
        c = payload[i]
        if in_str:
            if c == "\\" and i + 1 < n:
                val.append(_MYSQL_ESCAPES.get(payload[i + 1], payload[i + 1]))
                i += 2
                continue
            if c == "'":
                if i + 1 < n and payload[i + 1] == "'":  # '' doubling
                    val.append("'")
                    i += 2
                    continue
                in_str = False
                i += 1
                continue
            val.append(c)
        elif not in_row:
            if c == "(":
                in_row, cur, val, quoted = True, [], [], False
        elif c == "'":
            in_str = quoted = True
        elif c == ",":
            cur.append(finish())
            val, quoted = [], False
        elif c == ")":
            if val or quoted or cur:
                cur.append(finish())
            rows.append(cur)
            in_row = False
        elif not c.isspace():
            val.append(c)
        i += 1
    return rows


def read_mysql_dump(
    spark: SparkSession,
    path: str,
    columns: list[str] | T.StructType,
    *,
    table: str | None = None,
) -> DataFrame:
    """S6 MySQL-dump scan: extract ``INSERT INTO`` rows for ``table``
    from a mysqldump .sql[.gz] file as a typed DataFrame.

    The dump is read as lines (gzip transparent, splittable across
    executors — mysqldump puts each INSERT statement on one line), each
    partition's statements are parsed by the pure quote-aware scanner in
    one Arrow ``mapInPandas`` pass, and a final projection casts by
    position exactly like :func:`read_headerless`. No MySQL server, no
    driver-side loop.
    """
    if isinstance(columns, T.StructType):
        schema = columns
    else:
        schema = T.StructType(
            [T.StructField(c, T.StringType(), True) for c in columns]
        )
    names = [f.name for f in schema.fields]
    raw = T.StructType([T.StructField(c, T.StringType(), True) for c in names])
    prefix = f"INSERT INTO `{table}`" if table else "INSERT INTO "
    lines = spark.read.text(path).where(F.col("value").startswith(prefix))

    def parse(batches):
        import pandas as pd

        for b in batches:
            out = []
            for line in b["value"]:
                payload = line.partition(" VALUES ")[2]
                for r in parse_insert_values(payload):
                    if len(r) == len(names):
                        out.append(r)
            yield pd.DataFrame(out, columns=names, dtype=object)

    parsed = lines.mapInPandas(parse, schema=raw)
    return parsed.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
    )
