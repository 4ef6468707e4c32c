"""Source readers + ingest lifecycle (reference §2.1 scans / §3.2 flow)."""

from __future__ import annotations

import gzip
import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from epigraphdb_graph_spark.schema import ContractError, TableContract
from epigraphdb_graph_spark.sources.ingest import Dataset, ingest, ingest_all
from epigraphdb_graph_spark.sources.readers import (
    read_delimited,
    read_headerless,
    read_json_records,
    read_wide_matrix,
)


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("srcdata")
    # gzipped csv with header (S1)
    with gzip.open(d / "genes.csv.gz", "wt") as f:
        f.write("gene_id,symbol,score\nG1,ABC,1.5\nG2,DEF,2.5\n#junk,x,9\nG3,GHI,3.5\n")
    # headerless tsv (S2)
    (d / "map.tsv").write_text("P1\tU1\nP2\tU2\n")
    # nested json document (S3, Mondo-shaped)
    (d / "onto.json").write_text(json.dumps({
        "graphs": [{"nodes": [
            {"id": "D1", "lbl": "disease one", "type": "CLASS"},
            {"id": "D2", "lbl": "disease two", "type": "PROPERTY"},
        ]}]
    }))
    # wide matrix with 2 metadata lines (S8, GCT-shaped)
    (d / "expr.gct").write_text(
        "#1.2\n2\t3\ngene_id\tliver\tlung\tbrain\nG1\t1.0\t2.0\t3.0\nG2\t4.0\t5.0\t6.0\n")
    return str(d)


def test_read_delimited_gzip_comment(spark, data_dir):
    df = read_delimited(spark, f"{data_dir}/genes.csv.gz", comment="#")
    rows = df.orderBy("gene_id").collect()
    assert [r["gene_id"] for r in rows] == ["G1", "G2", "G3"]
    assert rows[0]["score"] == 1.5  # inferred double


def test_read_headerless_positional(spark, data_dir):
    df = read_headerless(spark, f"{data_dir}/map.tsv", ["protein", "uniprot"], sep="\t")
    assert df.schema["protein"].dataType == T.StringType()
    assert {(r["protein"], r["uniprot"]) for r in df.collect()} == {
        ("P1", "U1"), ("P2", "U2")}
    pruned = read_headerless(
        spark, f"{data_dir}/map.tsv", ["protein", "uniprot"], sep="\t",
        usecols=["uniprot"])
    assert pruned.columns == ["uniprot"]


def test_read_json_records_explode_filter(spark, data_dir):
    """Mondo pattern: explode graphs[0].nodes then filter type=='CLASS'
    (ref nodes/disease/mondo.py:52-66 / SURVEY P9)."""
    recs = read_json_records(spark, f"{data_dir}/onto.json", "graphs[0].nodes")
    keep = recs.filter(F.col("record.type") == "CLASS").select(
        F.col("record.id").alias("id"), F.col("record.lbl").alias("label"))
    assert keep.collect()[0].asDict() == {"id": "D1", "label": "disease one"}


def test_read_wide_matrix_skip_and_unpivot(spark, data_dir):
    long = read_wide_matrix(
        spark, f"{data_dir}/expr.gct", id_cols=["gene_id"],
        var_name="tissue", value_name="tpm", sep="\t", skip_rows=2)
    pdf = long.toPandas().sort_values(["gene_id", "tissue"]).reset_index(drop=True)
    assert len(pdf) == 6
    assert list(pdf.columns) == ["gene_id", "tissue", "tpm"]
    assert pdf.loc[0].tolist() == ["G1", "brain", 3.0]


def test_ingest_lifecycle_with_contract(spark, data_dir):
    contract = TableContract(
        name="gene",
        schema=T.StructType([
            T.StructField("gene_id", T.StringType(), False),
            T.StructField("symbol", T.StringType(), True),
            T.StructField("score", T.DoubleType(), True),
        ]),
        key="gene_id",
        required=["gene_id"],
    )
    ds = Dataset(
        meta_id="gene-test", source="testsrc",
        reader=lambda s: read_delimited(s, f"{data_dir}/genes.csv.gz", comment="#"),
        contract=contract, id_prop="gene_id", name_prop="symbol",
    )
    out = ingest(spark, ds).orderBy("gene_id").collect()
    assert [r["_id"] for r in out] == ["G1", "G2", "G3"]
    assert out[0]["_name"] == "ABC"
    assert out[0]["_source"] == ["testsrc"]


def test_ingest_rejects_undeclared_and_dupes(spark, data_dir):
    bad_contract = TableContract(
        name="gene",
        schema=T.StructType([T.StructField("gene_id", T.StringType(), False)]),
        key="gene_id", required=["gene_id"],
    )
    ds = Dataset(
        meta_id="g", source="s",
        reader=lambda s: read_delimited(s, f"{data_dir}/genes.csv.gz", comment="#"),
        contract=bad_contract,
    )
    with pytest.raises(ContractError, match="undeclared"):
        ingest(spark, ds)

    dup = Dataset(
        meta_id="g", source="s",
        reader=lambda s: s.createDataFrame(
            [("G1",), ("G1",)], "gene_id string"),
        contract=bad_contract,
    )
    with pytest.raises(ContractError, match="duplicate"):
        ingest(spark, dup)


def test_ingest_all_consolidates(spark, data_dir):
    c1 = TableContract(
        name="gene",
        schema=T.StructType([
            T.StructField("gene_id", T.StringType(), False),
            T.StructField("symbol", T.StringType(), True),
            T.StructField("score", T.DoubleType(), True),
        ]),
        key="gene_id",
    )
    ds1 = Dataset(
        meta_id="a", source="srcA",
        reader=lambda s: read_delimited(s, f"{data_dir}/genes.csv.gz", comment="#"),
        contract=c1,
    )
    ds2 = Dataset(
        meta_id="b", source="srcB",
        reader=lambda s: s.createDataFrame(
            [("G1", "OVERRIDDEN", 9.0), ("G9", "NEW", 7.0)],
            "gene_id string, symbol string, score double"),
    )
    out = ingest_all(spark, [ds1, ds2], key="gene_id").toPandas().set_index("gene_id")
    assert out.loc["G1", "symbol"] == "ABC"          # priority: srcA first
    assert out.loc["G9", "symbol"] == "NEW"
    assert sorted(out.loc["G1", "_source"]) == ["srcA", "srcB"]


def test_graph_import_roundtrip(spark, tmp_path):
    """S5: neo4j-admin bulk-import pair (typed .header + headerless
    .csv.gz) reads back as a typed DataFrame — nodes with ID space,
    int/float casts, string[] arrays; rels with START/END/TYPE."""
    from epigraphdb_graph_spark.sources.readers import read_graph_import

    with gzip.open(tmp_path / "gwas.csv.gz", "wt") as f:
        f.write("ieu-a-1,2015,0.46,MRC;IEU\n")
        f.write("ieu-a-2,,,solo\n")
    (tmp_path / "gwas.header").write_text(
        "id:ID(Gwas-ID),year:int,sd:float,_source:string[]\n"
    )
    nodes = read_graph_import(
        spark, str(tmp_path / "gwas.csv.gz"), str(tmp_path / "gwas.header")
    )
    assert [f.simpleString() for f in nodes.schema.fields] == [
        "id:string", "year:bigint", "sd:double", "_source:array<string>",
    ]
    rows = {r["id"]: r for r in nodes.collect()}
    assert rows["ieu-a-1"]["year"] == 2015
    assert rows["ieu-a-1"]["sd"] == pytest.approx(0.46)
    assert rows["ieu-a-1"]["_source"] == ["MRC", "IEU"]
    assert rows["ieu-a-2"]["year"] is None and rows["ieu-a-2"]["_source"] == ["solo"]

    (tmp_path / "rel.csv").write_text("ieu-a-1,rs123,0.12,GWAS_TO_VARIANT\n")
    (tmp_path / "rel.header").write_text(
        ":START_ID(Gwas-ID),:END_ID(Variant-ID),beta:float,:TYPE\n"
    )
    rels = read_graph_import(
        spark, str(tmp_path / "rel.csv"), str(tmp_path / "rel.header")
    )
    r = rels.collect()[0]
    assert (r["_start_id"], r["_end_id"], r["_type"]) == (
        "ieu-a-1", "rs123", "GWAS_TO_VARIANT")
    assert r["beta"] == pytest.approx(0.12)


def test_columns_as_rows(spark, data_dir):
    """R4: entity table from column names (GTEx tissue-node shape)."""
    from epigraphdb_graph_spark.sources.readers import columns_as_rows

    wide = read_delimited(spark, f"{data_dir}/genes.csv.gz", comment="#")
    out = columns_as_rows(wide, skip=1, name="tissue").collect()
    assert [(r["ordinal"], r["tissue"]) for r in out] == [
        (1, "symbol"), (2, "score")]


def test_mysql_dump_scan(spark, tmp_path):
    """S6: mysqldump INSERT statements -> typed rows (quote/escape-aware,
    gzip transparent, other tables' statements filtered out)."""
    from epigraphdb_graph_spark.sources.readers import read_mysql_dump

    dump = (
        "-- MySQL dump 10.13\n"
        "CREATE TABLE `study` (id int);\n"
        "INSERT INTO `study` VALUES "
        "(1,'GWAS of height, v2',2015,NULL),"
        "(2,'it''s complicated',2016,0.5),"
        "(3,'tab\\tsep (weird)',NULL,-1.25);\n"
        "INSERT INTO `other` VALUES (9,'ignore me',0,0);\n"
        "INSERT INTO `study` VALUES (4,'NULL',2020,3e-2);\n"
    )
    with gzip.open(tmp_path / "dump.sql.gz", "wt") as f:
        f.write(dump)
    df = read_mysql_dump(
        spark,
        str(tmp_path / "dump.sql.gz"),
        T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("year", T.IntegerType()),
            T.StructField("beta", T.DoubleType()),
        ]),
        table="study",
    )
    rows = {r["id"]: r for r in df.collect()}
    assert sorted(rows) == [1, 2, 3, 4]
    assert rows[1]["name"] == "GWAS of height, v2" and rows[1]["beta"] is None
    assert rows[2]["name"] == "it's complicated" and rows[2]["beta"] == 0.5
    assert rows[3]["name"] == "tab\tsep (weird)" and rows[3]["year"] is None
    assert rows[4]["name"] == "NULL" and rows[4]["beta"] == pytest.approx(0.03)


def test_stage_files_rsync_semantics(spark, tmp_path):
    """S7: Hadoop-FS staging — glob copy, length verify, idempotent skip,
    overwrite on size change."""
    from epigraphdb_graph_spark.sources.staging import (
        StagingError, stage_files, staging_manifest)

    src = tmp_path / "in"
    src.mkdir()
    (src / "a.csv").write_text("x,y\n1,2\n")
    (src / "b.csv").write_text("x,y\n3,4\n5,6\n")
    (src / "c.txt").write_text("not matched")
    dest = str(tmp_path / "staged")

    got = stage_files(spark, f"{src}/*.csv", dest)
    assert sorted((g.action, g.src.split("/")[-1]) for g in got) == [
        ("copied", "a.csv"), ("copied", "b.csv")]
    assert (tmp_path / "staged" / "a.csv").read_text() == "x,y\n1,2\n"

    # re-run: same sizes -> all skipped
    again = stage_files(spark, f"{src}/*.csv", dest)
    assert {g.action for g in again} == {"skipped"}

    # source grew -> re-copied
    (src / "a.csv").write_text("x,y\n1,2\n9,9\n")
    third = {g.src.split("/")[-1]: g.action for g in stage_files(spark, f"{src}/*.csv", dest)}
    assert third == {"a.csv": "copied", "b.csv": "skipped"}

    m = staging_manifest(spark, got).collect()
    assert len(m) == 2 and all(r["bytes"] > 0 for r in m)

    with pytest.raises(StagingError, match="no files match"):
        stage_files(spark, f"{src}/*.nope", dest)


def test_read_change_log_split_sizing(spark, tmp_path):
    """A compressed log that default-packs into one split is widened to
    ~target_splits; a log already wide enough is left alone."""
    from epigraphdb_graph_spark.sources.events import (
        generate_change_events, read_change_log)

    log = str(tmp_path / "log")
    generate_change_events(spark, 20_000, seed=7).repartition(16) \
        .write.parquet(log)
    default_max = str(128 << 20)
    spark.conf.set("spark.sql.files.maxPartitionBytes", default_max)

    df = read_change_log(spark, log, target_splits=8)
    assert df.rdd.getNumPartitions() >= 8
    assert int(spark.conf.get("spark.sql.files.maxPartitionBytes")) < (128 << 20)
    assert df.count() == 20_000

    # wide enough already (target 1): conf untouched
    spark.conf.set("spark.sql.files.maxPartitionBytes", default_max)
    read_change_log(spark, log, target_splits=1)
    assert spark.conf.get("spark.sql.files.maxPartitionBytes") == default_max
    spark.conf.set("spark.sql.files.maxPartitionBytes", default_max)
