"""JSONL source + partitioned corpus sink round trips (sources/corpus.py)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from sentinel_landsat_database_creation_spark.sources.corpus import (
    CORRUPT_COL,
    corrupt_split,
    read_documents_jsonl,
    write_corpus,
    write_documents_jsonl,
)
from sentinel_landsat_database_creation_spark.sources.testdata import table

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return table(spark, SF, "documents")


def test_jsonl_round_trip_exact(spark, tmp_path):
    docs = _docs(spark)
    p = str(tmp_path / "docs_jsonl")
    write_documents_jsonl(docs, p)
    back, bad = corrupt_split(read_documents_jsonl(spark, p))
    assert bad.count() == 0
    assert back.schema == docs.schema
    a = sorted(map(tuple, docs.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_jsonl_quarantines_corrupt_lines(spark, tmp_path):
    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}\n'
        "this is not json\n"
        '{"doc_id": 2, "text": "also ok", "lang": "de", "source": "s", "n_chars": 7}\n'
    )
    raw = read_documents_jsonl(spark, str(p))
    clean, bad = corrupt_split(raw)
    assert clean.count() == 2
    assert CORRUPT_COL not in clean.columns
    assert [r[CORRUPT_COL] for r in bad.collect()] == ["this is not json"]


def test_write_corpus_layout_and_round_trip(spark, tmp_path):
    docs = _docs(spark)
    p = str(tmp_path / "corpus")
    write_corpus(docs, p, partition_by=("lang",), max_records_per_file=10)
    langs = {r["lang"] for r in docs.select("lang").distinct().collect()}
    dirs = {d for d in os.listdir(p) if d.startswith("lang=")}
    assert dirs == {f"lang={l}" for l in langs}
    # maxRecordsPerFile: no parquet file holds more than 10 rows
    for d in dirs:
        full = os.path.join(p, d)
        files = [f for f in os.listdir(full) if f.endswith(".parquet")]
        assert files
        for f in files:
            n = spark.read.parquet(os.path.join(full, f)).count()
            assert n <= 10
    back = spark.read.parquet(p)
    assert sorted(back.columns) == sorted(docs.columns)
    a = sorted(map(tuple, docs.select(*sorted(docs.columns)).collect()))
    b = sorted(map(tuple, back.select(*sorted(docs.columns)).collect()))
    assert a == b


def test_compact_corpus_collapses_small_files(spark, tmp_path):
    """compact_corpus must (1) reduce the file count of an
    ingest-fragmented corpus to the aligned-writer layout, (2) bound
    file sizes, and (3) preserve content exactly."""
    import glob

    from sentinel_landsat_database_creation_spark.sources.corpus import (
        compact_corpus,
    )

    docs = table(spark, SF, "documents")
    frag = str(tmp_path / "frag")
    dst = str(tmp_path / "compact")
    # continuous-ingest shape: many writer tasks x partition dirs
    docs.repartition(7, F.col("doc_id")).write.partitionBy("lang").parquet(frag)
    n_before = len(glob.glob(f"{frag}/lang=*/*.parquet"))

    back = compact_corpus(spark, frag, dst, max_records_per_file=1000)
    n_after = len(glob.glob(f"{dst}/lang=*/*.parquet"))
    n_langs = docs.select("lang").distinct().count()

    assert n_before > n_langs, "fixture must actually be fragmented"
    assert n_after < n_before
    # aligned writer: exactly ceil(n/1000) files per lang dir
    per_lang = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for lang, n in per_lang.items():
        got = len(glob.glob(f"{dst}/lang={lang}/*.parquet"))
        assert got == (n + 999) // 1000
    # content identical
    cols = sorted(docs.columns)
    a = sorted(map(tuple, docs.select(*cols).collect()))
    b = sorted(map(tuple, back.select(*cols).collect()))
    assert a == b
