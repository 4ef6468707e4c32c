"""YAML registry: schema-definition validation sweep + config-driven
ingest (analog of the reference's tests/schema/test_schema_definition.py
sweep over db_schema.yaml and the Snakefile's eager pydantic validation
of data_integration.yaml, workflow/Snakefile:34-70)."""

from __future__ import annotations

import os

import pytest

from epigraphdb_graph_spark.registry import (
    FORMATS,
    TYPE_MAP,
    RegistryError,
    ingest_from_config,
    load_registry,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEMO = os.path.join(REPO, "config", "registry.yaml")


def _base() -> dict:
    return {
        "tables": {
            "pages": {
                "key": "url",
                "required": ["url", "warc_ts"],
                "columns": {
                    "url": "string",
                    "warc_ts": "timestamp",
                    "text": "string",
                    "lang": "string",
                },
            }
        },
        "datasets": [
            {"name": "a", "table": "pages", "source": "src-a",
             "format": "csv", "path": "a.csv", "id_prop": "url"},
        ],
    }


# --------------------------------------------------------- definition sweep

def test_demo_config_loads_and_is_complete():
    reg = load_registry(DEMO)
    assert set(reg.contracts) == {"pages"}
    c = reg.contracts["pages"]
    assert c.key == "url"
    assert c.required == ["url", "warc_ts"]
    # required columns are non-nullable, the rest nullable (reference:
    # `required: true` per property in db_schema.yaml)
    nullability = {f.name: f.nullable for f in c.schema.fields}
    assert nullability["url"] is False and nullability["text"] is True
    assert [d.name for d in reg.dataset_specs] == ["crawl_a", "crawl_b"]
    assert all(d.format in FORMATS for d in reg.dataset_specs)


@pytest.mark.parametrize("mutate,frag", [
    (lambda c: c["tables"]["pages"].update(key="nope"), "key 'nope'"),
    (lambda c: c["tables"]["pages"]["columns"].update(html="blob"),
     "unknown type 'blob'"),
    (lambda c: c["tables"]["pages"].update(required=["missing_col"]),
     "required column 'missing_col'"),
    (lambda c: c["tables"].update(pages={}), "'columns'"),
    (lambda c: c.update(tables={}), "'tables'"),
    (lambda c: c["datasets"][0].pop("path"), "missing required field 'path'"),
    (lambda c: c["datasets"][0].update(format="excel"), "unknown format"),
    (lambda c: c["datasets"][0].update(table="ghost"), "unknown target table"),
    (lambda c: c["datasets"][0].update(id_prop="ghost_col"),
     "id_prop 'ghost_col'"),
    (lambda c: c["datasets"].append(dict(c["datasets"][0])),
     "duplicate dataset name"),
])
def test_invalid_configs_fail_fast(mutate, frag):
    cfg = _base()
    mutate(cfg)
    with pytest.raises(RegistryError, match="invalid registry config") as ei:
        load_registry(cfg)
    assert frag in str(ei.value)


def test_every_declared_type_is_buildable():
    cfg = _base()
    cfg["tables"]["all_types"] = {
        "columns": {f"c_{t}": t for t in TYPE_MAP},
    }
    reg = load_registry(cfg)
    assert len(reg.contracts["all_types"].schema.fields) == len(TYPE_MAP)


def test_multiple_errors_reported_together():
    cfg = _base()
    cfg["tables"]["pages"]["key"] = "nope"
    cfg["datasets"][0]["format"] = "excel"
    with pytest.raises(RegistryError) as ei:
        load_registry(cfg)
    msg = str(ei.value)
    assert "key 'nope'" in msg and "unknown format" in msg


# ------------------------------------------------------ config-driven ingest

def test_ingest_from_config_end_to_end(spark, tmp_path):
    """Two sources (csv + parquet) declared purely in YAML consolidate into
    one row per key with provenance — zero per-dataset code."""
    import pandas as pd

    (tmp_path / "crawl_a.csv").write_text(
        "url,warc_ts,text,lang\n"
        "https://a.example/1,2024-01-01T00:00:00,alpha,en\n"
        "https://a.example/2,2024-01-02T00:00:00,beta,\n"
    )
    pdf = pd.DataFrame({
        "url": ["https://a.example/2", "https://a.example/3"],
        "warc_ts": pd.to_datetime(["2024-02-01", "2024-02-02"]),
        "text": [None, "gamma"],
        "lang": ["de", "fr"],
    })
    spark.createDataFrame(pdf).write.parquet(str(tmp_path / "crawl_b.parquet"))

    out = ingest_from_config(spark, DEMO, str(tmp_path)).toPandas() \
        .sort_values("url").reset_index(drop=True)
    assert list(out["url"]) == [f"https://a.example/{i}" for i in (1, 2, 3)]
    row2 = out[out["url"] == "https://a.example/2"].iloc[0]
    # first-non-null consolidation: text from crawl-a, lang from crawl-b
    assert row2["text"] == "beta" and row2["lang"] == "de"
    assert set(row2["_source"]) == {"crawl-a", "crawl-b"}


def test_ddl_generation_and_executability(spark, tmp_path):
    """K3: contract -> Spark-SQL DDL (bucketed-by-key = the index spec);
    the generated statement must actually execute against a catalog."""
    from epigraphdb_graph_spark.registry import ddl_for, load_registry

    c = load_registry(DEMO).contracts["pages"]
    ddl = ddl_for(c, n_buckets=8, location=str(tmp_path / "pages_tbl"))
    assert "CLUSTERED BY (`url`) INTO 8 BUCKETS" in ddl
    assert "`url` STRING NOT NULL" in ddl and "`text` STRING" in ddl
    spark.sql("DROP TABLE IF EXISTS pages")
    spark.sql(ddl)
    try:
        desc = {r["col_name"]: r["data_type"]
                for r in spark.sql("DESCRIBE TABLE pages").collect()}
        assert desc.get("url") == "string"
        assert desc.get("warc_ts") == "timestamp"
    finally:
        spark.sql("DROP TABLE IF EXISTS pages")


def test_config_driven_pipeline_into_lake(spark, tmp_path):
    """Whole reference-style build from one YAML: read + conform +
    consolidate via config, then land in the snapshot-versioned lake
    (overwrite = first bulk load; later deltas go through merge)."""
    import pandas as pd

    from epigraphdb_graph_spark.plans.lake import LakeTable
    from epigraphdb_graph_spark.registry import load_registry

    (tmp_path / "crawl_a.csv").write_text(
        "url,warc_ts,text,lang\n"
        "https://a.example/1,2024-01-01T00:00:00,alpha,en\n"
    )
    pdf = pd.DataFrame({
        "url": ["https://a.example/2"],
        "warc_ts": pd.to_datetime(["2024-02-01"]),
        "text": ["beta"], "lang": ["de"],
    })
    spark.createDataFrame(pdf).write.parquet(str(tmp_path / "crawl_b.parquet"))

    reg = load_registry(DEMO)
    consolidated = ingest_from_config(spark, DEMO, str(tmp_path)) \
        .drop("_source", "_id")
    contract = reg.contracts["pages"]
    table = LakeTable.create(spark, str(tmp_path / "lake"),
                             contract.schema, key=contract.key, n_buckets=4)
    table.overwrite(consolidated)
    got = table.read().select("url", "text").toPandas().sort_values("url")
    assert list(got["text"]) == ["alpha", "beta"]


def test_contract_violation_surfaces_through_config(spark, tmp_path):
    from epigraphdb_graph_spark.schema import ContractError

    (tmp_path / "crawl_a.csv").write_text(
        "url,warc_ts,text,lang\n"
        "https://dup/1,2024-01-01T00:00:00,x,en\n"
        "https://dup/1,2024-01-02T00:00:00,y,en\n"
    )
    cfg = _base()
    cfg["datasets"] = [dict(cfg["datasets"][0], path="crawl_a.csv")]
    with pytest.raises(ContractError, match="duplicate keys"):
        ingest_from_config(spark, cfg, str(tmp_path))
