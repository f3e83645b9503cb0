#!/usr/bin/env python
"""Measured plan report: flags + shuffle bytes for the headline queries."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import HEADLINE
from nyc_taxi_lakehouse_spark.registry import all_queries
from nyc_taxi_lakehouse_spark.session import get_spark
from nyc_taxi_lakehouse_spark.plans import audit

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

def main():
    spark = get_spark()
    specs = all_queries()
    for name in HEADLINE:
        df = specs[name].fn(spark, SF_DIR)
        n = len(df.collect())  # act on THIS plan so its metrics populate
        rep = audit(df)
        print(f"{name:32s} rows={n:>9d} shuffleMB={rep['shuffle_bytes_written']/1e6:8.2f} flags={','.join(rep['flags']) or '-'}")

if __name__ == "__main__":
    main()
