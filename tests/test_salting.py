"""Salted-join equivalence + skew-spread tests."""

import pytest
from pyspark.sql import functions as F

from osm_sidewalkreator_spark.operators import joins as J
from osm_sidewalkreator_spark.operators import salting as S
from osm_sidewalkreator_spark.operators.tiling import cell_id
from osm_sidewalkreator_spark.pages import geocode_pages, load_pages
from osm_sidewalkreator_spark.session import get_spark
from osm_sidewalkreator_spark.synth import ensure_synth

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    return get_spark(app="tests", shuffle_partitions=8)


def test_salted_join_same_result(spark):
    pages = geocode_pages(load_pages(spark, SF), SF) \
        .select("url", "x", "y") \
        .withColumn("cell", cell_id(F.col("x"), F.col("y"), 128.0))
    blocks = spark.read.parquet(str(ensure_synth(SF) / "blocks.parquet"))
    from osm_sidewalkreator_spark.operators.tiling import cover_cells
    dim = blocks.select(
        "block_id", "xmin", "ymin", "xmax", "ymax",
        F.explode(cover_cells(F.col("xmin"), F.col("ymin"),
                              F.col("xmax"), F.col("ymax"), 128.0))
         .alias("cell"))
    plain = (pages.join(dim, "cell")
             .filter((F.col("x") >= F.col("xmin")) & (F.col("x") < F.col("xmax"))
                     & (F.col("y") >= F.col("ymin")) & (F.col("y") < F.col("ymax")))
             .select("url", "block_id"))
    salted = (S.salted_cell_join(pages, dim, factor=8, fact_id="url")
              .filter((F.col("x") >= F.col("xmin")) & (F.col("x") < F.col("xmax"))
                      & (F.col("y") >= F.col("ymin")) & (F.col("y") < F.col("ymax")))
              .select("url", "block_id"))
    assert plain.count() == salted.count()
    assert plain.exceptAll(salted).count() == 0


def test_zipf_geocode_is_skewed(spark):
    """The synthetic geocode must actually exercise skew handling."""
    pages = geocode_pages(load_pages(spark, SF), SF)
    counts = (pages.groupBy("block_truth").count()
              .orderBy(F.col("count").desc()).collect())
    hottest = counts[0]["count"]
    median = counts[len(counts) // 2]["count"]
    assert hottest > 5 * max(median, 1)


def test_salt_spreads_hot_cell(spark):
    pages = geocode_pages(load_pages(spark, SF), SF) \
        .withColumn("cell", cell_id(F.col("x"), F.col("y"), 128.0))
    hot = S.top_hot_cells(pages, "cell", k=1)[0]
    salted = S.salt_fact(pages.filter(F.col("cell") == hot), "url", 8)
    per_salt = salted.groupBy("salt").count().collect()
    assert len(per_salt) == 8
    total = sum(r["count"] for r in per_salt)
    assert max(r["count"] for r in per_salt) < 0.35 * total
