"""A/B: F.session_window vs gaps-and-islands window-function plan for
events_session_30m at sf0.1.  min-of-5 interleaved, clearCache between
samples (the bench harness discipline)."""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window
from pyspark.sql import functions as F

from tailsql_spark.plans.catalog import load_tables
from tailsql_spark.session import get_spark

SF = "/root/testdata/sf0.1"


def plan_session_window(spark):
    t = load_tables(spark, SF)
    e = t["events"].select("user_id", F.date_trunc("second", F.col("ts")).alias("ts_s"))
    return (
        e.groupBy("user_id", F.session_window("ts_s", "30 minutes").alias("sw"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


def plan_gaps_islands(spark):
    t = load_tables(spark, SF)
    e = t["events"].select("user_id", F.date_trunc("second", F.col("ts")).alias("ts_s"))
    w = Window.partitionBy("user_id").orderBy("ts_s")
    flagged = e.withColumn(
        "new_s",
        F.when(
            F.lag("ts_s").over(w).isNull()
            | (F.col("ts_s").cast("long") - F.lag("ts_s").over(w).cast("long") >= 1800),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn("sid", F.sum("new_s").over(w))
    return (
        sess.groupBy("user_id", "sid")
        .agg(
            F.min("ts_s").alias("session_start"),
            (F.max("ts_s") + F.expr("INTERVAL 30 MINUTES")).alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .drop("sid")
        .select("user_id", "session_start", "session_end", "n_events")
    )


def main():
    spark = get_spark(app_name="ab_session")
    spark.sparkContext.setLogLevel("ERROR")
    plans = {"session_window": plan_session_window, "gaps_islands": plan_gaps_islands}
    # correctness cross-check first
    a = plan_session_window(spark).orderBy("user_id", "session_start").collect()
    b = plan_gaps_islands(spark).orderBy("user_id", "session_start").collect()
    print("rows:", len(a), len(b), "equal:", a == b)
    # warmup each
    for fn in plans.values():
        fn(spark).collect()
    best = {k: float("inf") for k in plans}
    for _ in range(5):
        for k, fn in plans.items():
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark).collect()
            best[k] = min(best[k], time.perf_counter() - t0)
    for k, v in best.items():
        print(f"{k}: {v:.3f}s")


if __name__ == "__main__":
    main()
