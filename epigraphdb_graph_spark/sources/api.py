"""REST-API source patterns (SURVEY.md §2.1 S4).

The reference harvests upstream APIs driver-side into pandas
(requests.get(...).json() -> pd.DataFrame — source/get_opengwas.py:20-45,
rels/gwas-gencor.py:32-43, incl. transposed dict-of-dicts and paged POST
loops). Two Spark-first shapes replace it:

- ``fetch_records``: small/paged feeds — fetch on the driver (the part
  that must be sequential anyway: auth, paging cursors), then
  ``createDataFrame``. Right when the API result is << cluster scale.
- ``fetch_partitioned``: many independent endpoints (one per id) — ship
  the id list as a DataFrame and fetch *inside* ``mapInPandas``, so
  thousands of calls spread across executors with bounded per-task
  concurrency. Right for fan-out harvests like the reference's per-GWAS
  MELODI pulls (34-167 min single-host, source/get_gwas_melodi.py:128-129).

The HTTP call itself is injected (``fetcher``): tests use a deterministic
fake; production passes a requests/urllib closure. No network IO happens
in this module itself.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def with_retry(
    fetcher: Callable,
    *,
    retries: int = 4,
    backoff_s: float = 0.5,
    backoff_mult: float = 2.0,
    retry_on: tuple[type[BaseException], ...] = (Exception,),
    sleep: Callable[[float], None] = time.sleep,
) -> Callable:
    """Wrap a fetcher with bounded exponential-backoff retries — the
    hardening the reference's paged POST harvest loop needs but does not
    have (one transient 5xx aborts a 34-167 min run,
    source/get_opengwas.py:35-45, get_gwas_melodi.py:128-129).

    ``retries`` is the number of RE-attempts after the first call (so at
    most ``retries + 1`` calls); delays are ``backoff_s * backoff_mult**i``.
    The wrapper is a plain closure — serializable, so it hardens both the
    driver-side paging loop and per-id fetchers shipped into
    ``fetch_partitioned`` executors. ``sleep`` is injectable for tests."""
    if retries < 0:
        raise ValueError("retries must be >= 0")

    def wrapped(*a, **kw):
        delay = backoff_s
        for attempt in range(retries + 1):
            try:
                return fetcher(*a, **kw)
            except retry_on:
                if attempt == retries:
                    raise
                sleep(delay)
                delay *= backoff_mult

    return wrapped


def fetch_paged(
    spark: SparkSession,
    fetch_page: Callable[[object], tuple[list[dict], object | None]],
    *,
    schema: T.StructType | str,
    start_cursor: object = 0,
    max_pages: int | None = None,
    retries: int = 4,
    backoff_s: float = 0.5,
    sleep: Callable[[float], None] = time.sleep,
) -> DataFrame:
    """Driver-side cursor-paging loop -> DataFrame (the reference's paged
    POST shape, source/get_opengwas.py:35-45, made explicit and retried).

    ``fetch_page(cursor) -> (records, next_cursor)``; paging stops when
    ``next_cursor`` is None (or ``max_pages`` is hit — a guard against
    an API that echoes the same cursor forever). Each page call is
    retried with exponential backoff, so one transient failure resumes
    from the SAME cursor instead of restarting the harvest."""
    hardened = with_retry(fetch_page, retries=retries, backoff_s=backoff_s,
                          sleep=sleep)
    records: list[dict] = []
    cursor: object | None = start_cursor
    pages = 0
    while cursor is not None:
        if max_pages is not None and pages >= max_pages:
            break
        page, cursor = hardened(cursor)
        records.extend(page)
        pages += 1
    if not records:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(pd.DataFrame(records), schema)


def fetch_records(
    spark: SparkSession,
    pages: Iterable[dict],
    *,
    schema: T.StructType | str,
    transpose: bool = False,
    transpose_id_col: str = "id",
) -> DataFrame:
    """Driver-side fetch -> DataFrame. ``pages`` is any iterable of JSON
    documents (the caller's paging loop, already authenticated).
    ``transpose=True`` handles the dict-of-dicts orientation the reference
    meets (pd.DataFrame(res).T — source/get_opengwas.py:26-27); the outer
    dict's keys (the record ids, which land in the pandas index after
    ``.T``) are preserved as ``transpose_id_col`` — createDataFrame drops
    the index, so they must be reset into a real column."""
    frames = []
    for doc in pages:
        if transpose:
            pdf = pd.DataFrame(doc).T
            pdf.index.name = transpose_id_col
            pdf = pdf.reset_index()
        else:
            pdf = pd.DataFrame(doc)
        frames.append(pdf)
    if not frames:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(pd.concat(frames, ignore_index=True), schema)


def fetch_partitioned(
    ids: DataFrame,
    fetcher: Callable[[object], list[dict]],
    *,
    schema: T.StructType | str,
    id_col: str = "id",
) -> DataFrame:
    """Executor-side fan-out: one ``fetcher(id) -> [records]`` call per id,
    run inside mapInPandas over the ids DataFrame. Repartition ``ids`` to
    control call concurrency (tasks = partitions); failures should be
    handled inside ``fetcher`` (return [] / tagged error records) so one
    bad endpoint doesn't fail a task of hundreds."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for v in pdf[id_col]:
                rows.extend(fetcher(v))
            if rows:
                yield pd.DataFrame(rows)

    return ids.mapInPandas(run, schema)
