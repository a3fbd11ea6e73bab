"""q21 prefix experiment (guide §2.4): the two-stage aggregation shuffles
lineitem-derived rows TWICE — Exchange on (l_orderkey, l_suppkey) for the
pair-distinct, then Exchange on (l_orderkey) for the per-order stats. A
repartition by l_orderkey FIRST satisfies ClusteredDistribution for BOTH
groupbys (partitioning by a subset of the grouping keys clusters every full
key), so both aggregations run partition-local: one full-size exchange
instead of two. Partial agg on the pairs stage saves ~nothing here because
(orderkey, suppkey) is nearly unique in lineitem.

A/B: variant A = current two-stage shape, variant B = repartition prefix.
Interleaved pairs, min over runs printed per pair.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from modin_spark.session import get_spark  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def build_a(spark, sf):
    li = spark.read.parquet(f"{sf}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey",
        F.when(F.col("l_returnflag") == "R", F.col("l_suppkey")).alias("fail_supp"),
    )
    pairs = li.groupBy("l_orderkey", "l_suppkey").agg(F.max("fail_supp").alias("r"))
    st = pairs.groupBy("l_orderkey").agg(
        F.count("l_suppkey").alias("ns"), F.count("r").alias("nf"), F.max("r").alias("fs")
    )
    return st


def build_b(spark, sf):
    ncpu = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    li = spark.read.parquet(f"{sf}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey",
        F.when(F.col("l_returnflag") == "R", F.col("l_suppkey")).alias("fail_supp"),
    ).repartition(ncpu, "l_orderkey")
    pairs = li.groupBy("l_orderkey", "l_suppkey").agg(F.max("fail_supp").alias("r"))
    st = pairs.groupBy("l_orderkey").agg(
        F.count("l_suppkey").alias("ns"), F.count("r").alias("nf"), F.max("r").alias("fs")
    )
    return st


def finish(spark, sf, st):
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    sup = spark.read.parquet(f"{sf}/supplier.parquet")
    j = st.where((F.col("ns") > 1) & (F.col("nf") == 1)).join(
        orders.where(F.col("o_orderstatus") == "F").select("o_orderkey"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    w = j.groupBy("fs").agg(F.count("l_orderkey").alias("numwait"))
    out = w.join(F.broadcast(sup.select("s_suppkey", "s_name")), F.col("fs") == F.col("s_suppkey")).select(
        "s_name", "numwait"
    )
    return out.orderBy(F.col("numwait").desc(), F.col("s_name")).limit(20)


def main() -> None:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark()
    spark.read.parquet(f"{sf}/lineitem.parquet").count()

    # correctness first: identical rows
    ra = [tuple(r) for r in finish(spark, sf, build_a(spark, sf)).collect()]
    rb = [tuple(r) for r in finish(spark, sf, build_b(spark, sf)).collect()]
    print("match:", ra == rb, len(ra))
    if ra != rb:
        sys.exit(1)

    exchanges = {}
    for tag, b in (("a", build_a), ("b", build_b)):
        plan = finish(spark, sf, b(spark, sf))._jdf.queryExecution().executedPlan().toString()
        exchanges[tag] = plan.count("Exchange hashpartitioning")
    print("exchanges:", exchanges)

    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    for i in range(pairs):
        row = {}
        for tag, b in (("a", build_a), ("b", build_b)):
            t0 = time.time()
            finish(spark, sf, b(spark, sf)).write.format("noop").mode("overwrite").save()
            row[tag] = round(time.time() - t0, 3)
        print(f"pair {i}: a={row['a']} b={row['b']}")


if __name__ == "__main__":
    main()
