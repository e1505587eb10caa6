"""Dump formatted physical plans for catalog queries — the perf-iteration
loop's companion to bench.py. Usage::

    python tools/explain_all.py [sf_dir] [query ...]   # default: bench headline
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark import (  # noqa: E402
    catalog,
)
from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.session import (  # noqa: E402
    get_spark,
)


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    names = [a for a in args if not os.path.isdir(a)]
    if not names:
        import bench

        names = bench.HEADLINE
    spark = get_spark("explain_all")
    for name in names:
        print(f"\n{'=' * 70}\n{name}\n{'=' * 70}")
        catalog.QUERIES[name](spark, sf_dir).explain("formatted")


if __name__ == "__main__":
    main()
