"""Hub-cap verification for the two self-join candidate generators
(r4 verdict item #5): `graph_common_neighbors` and
`agg_basket_affinity` bound per-key fanout with a deterministic top-K
cap, so ONE hub key (a part every supplier carries, a mega-basket)
can no longer make the candidate join quadratic.

The skewed replica plants exactly that adversary: a hub part supplied
by every supplier / a hub order containing hundreds of brands, far
past the cap. The tests then assert the two properties that matter:

1. BOUNDEDNESS — the operator's candidate volume on the skewed data
   is capped (the hub contributes at most C(K,2) pairs, not C(f,2)).
2. ORACLE PARITY ON SKEWED DATA — the DuckDB oracle expresses the
   SAME cap, so the correctness gate holds exactly where the cap
   actually bites (TPC-H-shaped data never triggers it).
"""

from __future__ import annotations

import os
import shutil

import duckdb
import pytest
from pyspark.sql import functions as F

from etl_8x8_spark.registry import all_queries


@pytest.fixture(scope="module")
def queries():
    return all_queries()


def _write_skewed_tables(spark, out_dir: str) -> None:
    """A tiny lineitem/part pair with adversarial hubs.

    - part 9999 is supplied by ALL 500 suppliers (hub part);
      every other (s, p) edge has fanout <= 3 suppliers per part.
    - order 77777 contains 400 distinct parts across 80 brands
      (mega-basket); every other order holds <= 4 lineitems.
    """
    os.makedirs(out_dir, exist_ok=True)
    # normal edges: each group of 5 suppliers (g = s//5) shares a
    # 4-part pool {4g..4g+3}, so within-group pairs have n_common=4
    # (>= the min-common filter) while cross-group pairs share nothing
    s = (F.col("id") / 4).cast("long")
    normal = spark.range(2000).select(
        s.alias("l_suppkey"),
        ((s / 5).cast("long") * 4 + F.col("id") % 4).alias("l_partkey"),
        (F.col("id") % 600).alias("l_orderkey"),
    )
    hub_part = spark.range(500).select(
        F.col("id").alias("l_suppkey"),
        F.lit(9999).alias("l_partkey"),
        (F.col("id") % 600).alias("l_orderkey"),
    )
    mega_basket = spark.range(400).select(
        (F.col("id") % 500).alias("l_suppkey"),
        F.col("id").alias("l_partkey"),
        F.lit(77777).alias("l_orderkey"),
    )
    li = normal.unionByName(hub_part).unionByName(mega_basket)
    li.coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/lineitem.parquet")
    part = spark.range(10000).select(
        F.col("id").alias("p_partkey"),
        F.concat(F.lit("Brand#"), (F.col("id") % 80).cast("string")).alias(
            "p_brand"
        ),
    )
    part.coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/part.parquet")


@pytest.fixture(scope="module")
def skew_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("hub_skew"))
    _write_skewed_tables(spark, d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _oracle(con: duckdb.DuckDBPyConnection, skew_dir: str, sql: str):
    for t in ("lineitem", "part"):
        # Spark writes <name>.parquet as a directory of part files
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{skew_dir}/{t}.parquet/*.parquet'"
        )
    return con.sql(sql).df()


class TestCommonNeighborsHubCap:
    def test_capped_edges_bound_hub_fanout(self, spark, skew_dir):
        from etl_8x8_spark.operators.graph import _CN_DEG_CAP

        # reconstruct the capped edge set exactly as the operator does
        from pyspark.sql import Window

        sp_all = (
            spark.read.parquet(f"{skew_dir}/lineitem.parquet")
            .select(F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p"))
            .distinct()
        )
        w = Window.partitionBy("p").orderBy("s")
        capped = (
            sp_all.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= _CN_DEG_CAP)
        )
        per_part = capped.groupBy("p").count()
        assert per_part.agg(F.max("count")).first()[0] <= _CN_DEG_CAP
        # the hub part would have contributed C(500,2)=124750 pairs
        # uncapped; capped it contributes C(32,2)=496
        hub = per_part.filter(F.col("p") == 9999).first()
        assert hub is not None and hub["count"] == _CN_DEG_CAP

    def test_oracle_parity_on_skewed_data(self, spark, skew_dir, queries):
        spec = queries["graph_common_neighbors"]
        sdf = (
            spec.builder(spark, skew_dir)
            .toPandas()
            .sort_values(["supp_a", "supp_b"])
            .reset_index(drop=True)
        )
        odf = (
            _oracle(duckdb.connect(), skew_dir, spec.oracle)
            .sort_values(["supp_a", "supp_b"])
            .reset_index(drop=True)
        )
        assert len(sdf) == len(odf) > 0
        assert (sdf["supp_a"].values == odf["supp_a"].values).all()
        assert (sdf["supp_b"].values == odf["supp_b"].values).all()
        assert (sdf["n_common"].values == odf["n_common"].values).all()
        assert (sdf["jaccard"].values == odf["jaccard"].values).all()


class TestBasketAffinityHubCap:
    def test_capped_items_bound_mega_basket(self, spark, skew_dir):
        from pyspark.sql import Window

        from etl_8x8_spark.operators.aggregates import _BASKET_CAP

        li = spark.read.parquet(f"{skew_dir}/lineitem.parquet")
        part = spark.read.parquet(f"{skew_dir}/part.parquet")
        items_all = (
            li.join(part, li.l_partkey == part.p_partkey)
            .select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("brand"))
            .distinct()
        )
        # the mega-basket holds 80 distinct brands uncapped
        mega_n = items_all.filter(F.col("ok") == 77777).count()
        assert mega_n > _BASKET_CAP
        w = Window.partitionBy("ok").orderBy("brand")
        capped = (
            items_all.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= _BASKET_CAP)
        )
        per_ok = capped.groupBy("ok").count()
        assert per_ok.agg(F.max("count")).first()[0] <= _BASKET_CAP

    def test_oracle_parity_on_skewed_data(self, spark, skew_dir, queries):
        spec = queries["agg_basket_affinity"]
        sdf = (
            spec.builder(spark, skew_dir)
            .toPandas()
            .sort_values(["brand_a", "brand_b"])
            .reset_index(drop=True)
        )
        odf = (
            _oracle(duckdb.connect(), skew_dir, spec.oracle)
            .sort_values(["brand_a", "brand_b"])
            .reset_index(drop=True)
        )
        assert len(sdf) == len(odf) > 0
        for c in ("brand_a", "brand_b", "n_pair", "support", "conf_a_to_b", "lift"):
            assert (sdf[c].values == odf[c].values).all(), c
