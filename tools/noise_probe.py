"""Quick host-noise probe: sentinel queries vs BASELINE_SENTINELS minima.
Prints the median factor (1.0 = quiet host). Usage: python tools/noise_probe.py"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    import __spark_entry__ as entry
    from modin_spark.session import get_spark

    spark = get_spark()
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.read.parquet(f"{sf}/lineitem.parquet").count()
    qs = entry.queries()
    frozen = json.load(open(os.path.join(REPO, "BASELINE_SENTINELS.json")))["sentinels"]
    factors = []
    for name, base in frozen.items():
        runs = []
        for _ in range(3):
            t0 = time.time()
            qs[name](spark, sf).count()
            runs.append(time.time() - t0)
        factors.append(min(runs) / base)
    factors.sort()
    print(json.dumps({"noise": round(factors[1], 2),
                      "factors": [round(f, 2) for f in factors]}))


if __name__ == "__main__":
    main()
