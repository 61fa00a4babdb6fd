"""Schema evolution on append: runs with different column sets decode
with NULLs for the columns a run lacks — never row misalignment, never a
sheared table (decode_table per-run splice; SURVEY.md §2.2 S5/S7 note).

Bug class this pins: a part holding pages from two runs, where a column
exists in only one run, used to zip rows from DIFFERENT runs together
(the same silent-corruption family as the compact_parts ordering fix).
"""

import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from cpp_parquet_spark.engine import (EncodeConfig, decode_table,
                                      encode_table, read_committed_pages,
                                      run_encode)


@pytest.fixture()
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_append_run_with_extra_column_decodes_nulls(spark, docs, tmp_path):
    dst = str(tmp_path / "evo")
    cfg = EncodeConfig(keys=("doc_id",), salt_from=("doc_id",), num_parts=4,
                       order_keys=("doc_id",), table_name="evo")
    a = docs.filter(F.col("doc_id") < 50).select("doc_id", "text")
    b = (docs.filter((F.col("doc_id") >= 50) & (F.col("doc_id") < 100))
             .select("doc_id", "text", "lang"))
    run_encode(spark, a, dst, cfg, run_id="run_a", resume=False)
    run_encode(spark, b, dst, cfg, run_id="run_b", resume=False)

    dec = decode_table(read_committed_pages(spark, dst), spark)
    assert set(dec.columns) == {"doc_id", "text", "lang"}
    got = {r["doc_id"]: (r["text"], r["lang"]) for r in dec.collect()}
    want = {r["doc_id"]: (r["text"], r["lang"])
            for r in docs.filter(F.col("doc_id") < 100)
                         .select("doc_id", "text", "lang").collect()}
    assert len(got) == len(want)
    for k, (text, lang) in want.items():
        gt, gl = got[k]
        assert gt == text, f"text corrupted for doc {k}"
        if k < 50:
            assert gl is None, f"doc {k} from run_a must decode lang=NULL"
        else:
            assert gl == lang, f"lang corrupted for doc {k}"


def test_append_run_with_dropped_column_decodes_nulls(spark, docs, tmp_path):
    """Later run DROPS a column; earlier rows keep their values, later
    rows decode as NULL. Also exercises same part_id across runs (both
    runs use the same hash space), the misalignment trigger."""
    dst = str(tmp_path / "evo2")
    cfg = EncodeConfig(keys=("doc_id",), salt_from=("doc_id",), num_parts=2,
                       order_keys=("doc_id",), table_name="evo2")
    a = docs.filter(F.col("doc_id") < 40).select("doc_id", "source", "text")
    b = (docs.filter((F.col("doc_id") >= 40) & (F.col("doc_id") < 80))
             .select("doc_id", "text"))
    run_encode(spark, a, dst, cfg, run_id="run_a", resume=False)
    run_encode(spark, b, dst, cfg, run_id="run_b", resume=False)

    dec = decode_table(read_committed_pages(spark, dst), spark)
    rows = {r["doc_id"]: r for r in dec.collect()}
    src = {r["doc_id"]: r for r in
           docs.filter(F.col("doc_id") < 80).collect()}
    assert len(rows) == 80
    for k, r in rows.items():
        assert r["text"] == src[k]["text"], f"text corrupted for doc {k}"
        if k < 40:
            assert r["source"] == src[k]["source"]
        else:
            assert r["source"] is None


def test_same_schema_appends_unchanged(spark, docs, tmp_path):
    """Regression guard: same-schema multi-run decode is byte-identical
    to the source (the per-run splice must not reorder anything)."""
    dst = str(tmp_path / "evo3")
    cfg = EncodeConfig(keys=("doc_id",), salt_from=("doc_id",), num_parts=2,
                       order_keys=("doc_id",), table_name="evo3")
    cols = ["doc_id", "text", "lang"]
    run_encode(spark, docs.filter(F.col("doc_id") < 60).select(*cols),
               dst, cfg, run_id="r1", resume=False)
    run_encode(spark, docs.filter((F.col("doc_id") >= 60)
                                  & (F.col("doc_id") < 120)).select(*cols),
               dst, cfg, run_id="r2", resume=False)
    dec = decode_table(read_committed_pages(spark, dst), spark)
    orig = docs.filter(F.col("doc_id") < 120).select(*cols)
    assert dec.exceptAll(orig).count() == 0
    assert orig.exceptAll(dec).count() == 0
