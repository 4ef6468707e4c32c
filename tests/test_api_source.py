"""REST-API source patterns with a deterministic offline fetcher."""

from __future__ import annotations

from epigraphdb_graph_spark.sources.api import fetch_partitioned, fetch_records


def test_fetch_records_paged_and_transposed(spark):
    pages = [
        {"id": ["a", "b"], "score": [1.0, 2.0]},
        {"id": ["c"], "score": [3.0]},
    ]
    df = fetch_records(spark, pages, schema="id string, score double")
    assert df.count() == 3

    # dict-of-dicts orientation (reference: pd.DataFrame(res).T) — the
    # outer keys must survive into the id column, not die in the index
    doc = {"gwas-1": {"trait": "bmi"}, "gwas-2": {"trait": "height"}}
    df2 = fetch_records(spark, [doc], schema="gid string, trait string",
                        transpose=True, transpose_id_col="gid")
    assert {r["gid"] for r in df2.collect()} == {"gwas-1", "gwas-2"}
    assert dict(df2.collect()[0].asDict()) in (
        {"gid": "gwas-1", "trait": "bmi"}, {"gid": "gwas-2", "trait": "height"})


def test_fetch_partitioned_fanout(spark):
    ids = spark.range(20).withColumnRenamed("id", "gid").repartition(4)

    def fake_fetcher(gid):
        # deterministic fake endpoint: 2 records per id, one "missing" id
        if gid == 13:
            return []
        return [
            {"gid": int(gid), "k": 0, "value": float(gid) * 10},
            {"gid": int(gid), "k": 1, "value": float(gid) * 10 + 1},
        ]

    out = fetch_partitioned(
        ids, fake_fetcher, schema="gid long, k long, value double", id_col="gid")
    pdf = out.toPandas()
    assert len(pdf) == 19 * 2
    assert 13 not in set(pdf["gid"])
    assert pdf.loc[pdf["gid"] == 7, "value"].tolist() == [70.0, 71.0]
