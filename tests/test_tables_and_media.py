"""DDL/INSERT surface (S7/S8/M2/M5 as Spark SQL over managed parquet
tables) and the multimodal frame-sampling/resize plumbing."""

from __future__ import annotations

import hashlib

from pyspark.sql import Row

from beacon_data_importer_spark.operators import multimodal as MM


def test_create_insert_select_drop_table(spark, tmp_path):
    """The staging-table lifecycle: CREATE TABLE ... USING PARQUET,
    INSERT INTO ... SELECT with a join, read back, DROP (mirrors
    create_tmp_tables.sql + import_identified_needs.sql shape)."""
    loc = tmp_path / "tbl"
    spark.sql(
        f"CREATE TABLE tmp_needs_test (nhs_number STRING, category STRING) "
        f"USING PARQUET LOCATION '{loc}'"
    )
    try:
        src = spark.createDataFrame(
            [Row(nhs_number="N1", category="food"), Row(nhs_number="N2", category="misc")]
        )
        src.createOrReplaceTempView("src_needs")
        spark.sql(
            "INSERT INTO tmp_needs_test SELECT nhs_number, category FROM src_needs "
            "WHERE category = 'food'"
        )
        rows = spark.sql("SELECT * FROM tmp_needs_test").collect()
        assert [(r.nhs_number, r.category) for r in rows] == [("N1", "food")]
    finally:
        spark.sql("DROP TABLE IF EXISTS tmp_needs_test")
    assert "tmp_needs_test" not in [t.name for t in spark.catalog.listTables()]


def test_jdbc_wrappers_importable():
    from beacon_data_importer_spark.sources import jdbc

    assert callable(jdbc.read_jdbc) and callable(jdbc.write_jdbc)


def test_sample_frames_fanout(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=2, text="some video payload")]  # doc_id%3==2 -> video
    )
    decoded = MM.decode_media(MM.media_from_documents(docs))
    n_frames = decoded.collect()[0].n_frames
    frames = MM.sample_frames(decoded, every_k=4).collect()
    expect_idx = list(range(0, n_frames, 4))
    assert sorted(f.frame_idx for f in frames) == expect_idx
    f0 = [f for f in frames if f.frame_idx == 0][0]
    assert f0.frame_md5 == hashlib.md5(b"2|0").hexdigest()


def test_resize_meta_preserves_aspect(spark):
    decoded = spark.createDataFrame([Row(media_id=1, width=200, height=100)])
    r = MM.resize_meta(decoded, max_side=64).collect()[0]
    assert (r.target_width, r.target_height) == (64, 32)
