"""Run the 22 TPC-H queries at the sf1 (10x) and sf10_tpch (100x) rungs and
freeze BASELINE_LOCAL_sf10_tpch.json.

Question (VERDICT r9 item 7): the text family has a measured 100x rung; the
join-heavy half of the headline set only had 10x. Protocol mirrors
tools/run_sf10.py: 2 timed runs per query per rung, keep the min (ASV), and
record the sf10/sf1 ratio. Data grows 10x between rungs, so a scale-healthy
query lands at <= ~10x; anything above ~12x (superlinear beyond noise) is a
finding and gets its physical plan dumped for diffing.

Usage: python tools/make_sf1.py && python tools/make_sf10_tpch.py &&
       python tools/run_sf10_tpch.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
SF1 = os.path.join(REPO, ".localdata", "sf1")
SF10 = os.path.join(REPO, ".localdata", "sf10_tpch")

TPCH = [
    "q1_pricing_summary", "q2_min_cost_supplier", "q3_top_orders",
    "q4_priority_returned", "q5_nation_revenue", "q6_forecast_revenue",
    "q7_volume_shipping", "q8_market_share", "q9_profit_by_nation",
    "q10_returned_revenue", "q11_important_parts", "q12_priority_lines",
    "q13_order_distribution", "q14_promo_revenue", "q15_top_supplier",
    "q16_supplier_count", "q17_small_quantity", "q18_large_volume",
    "q19_brand_filter", "q20_part_promotion", "q21_waiting_supplier",
    "q22_global_sales",
]


def main() -> None:
    import __spark_entry__ as entry
    from modin_spark.session import get_spark

    spark = get_spark()
    qs = entry.queries()
    out: dict = {"queries": {}, "superlinear": []}

    for name in TPCH:
        fn = qs[name]
        row: dict = {}
        for label, sf in (("sf1", SF1), ("sf10", SF10)):
            runs = []
            for _ in range(2):
                t0 = time.time()
                fn(spark, sf).count()
                runs.append(time.time() - t0)
            row[label] = round(min(runs), 3)
        row["ratio"] = round(row["sf10"] / max(row["sf1"], 1e-9), 2)
        out["queries"][name] = row
        flag = " <-- SUPERLINEAR" if row["ratio"] > 12 else ""
        print(f"{name}: sf1 {row['sf1']}s sf10 {row['sf10']}s ratio {row['ratio']}x{flag}")
        if row["ratio"] > 12:
            out["superlinear"].append(name)
            plan = fn(spark, SF10)._sc if False else None  # noqa: placeholder
            try:
                sdf = fn(spark, SF10)
                with open(os.path.join(REPO, f"plan_sf10_{name}.txt"), "w") as f:
                    f.write(sdf._jdf.queryExecution().explainString(
                        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
            except Exception as e:
                print(f"  plan dump failed: {e}")

    ratios = [r["ratio"] for r in out["queries"].values()]
    out["median_ratio"] = sorted(ratios)[len(ratios) // 2]
    out["max_ratio"] = max(ratios)
    with open(os.path.join(REPO, "BASELINE_LOCAL_sf10_tpch.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"median_ratio": out["median_ratio"], "max_ratio": out["max_ratio"],
                      "superlinear": out["superlinear"]}))


if __name__ == "__main__":
    main()
