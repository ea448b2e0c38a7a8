"""Usage demo mirroring the reference's executable scenario (main.py:36-55):
simulated delta and full loads through the append-only CDC pipeline, then
the same loads through the SCD2 store.

Run: python examples/demo_historization.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas_etl_framework_spark as etl

GRADES = [
    # Lastname, Firstname, SSN, Test1, Grade  (abridged schema for the demo)
    ("Alfalfa", "Aloysius", "123-45-6789", 40.0, "D-"),
    ("Rubble", "Betty", "234-56-7890", 44.0, "C-"),
    ("Franklin", "Benny", "234-56-2890", 50.0, "B-"),
]
SECOND_LOAD = [
    ("George", "Boy", "345-67-3901", 40.0, "B"),       # new key
    ("Franklin", "Benny", "234-56-2890", 60.0, "B+"),  # changed record
]
SCHEMA = "Lastname string, Firstname string, SSN string, Test1 double, Grade string"
KEYS = ["Lastname", "Firstname"]


def main() -> None:
    spark = etl.get_spark(app_name="demo", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    workdir = tempfile.mkdtemp(prefix="etl_demo_")

    # --- append-only CDC historization (the reference's LIVE pipeline) ----
    store = f"{workdir}/current"
    final = etl.simulate_runs(
        spark,
        {
            "first_run": spark.createDataFrame(GRADES, SCHEMA),
            "second_run": spark.createDataFrame(SECOND_LOAD, SCHEMA),
        },
        store,
        KEYS,
        load_ts_by_run={
            "first_run": "2024-01-10 08:00:00",
            "second_run": "2024-01-11 08:00:00",
        },
    )
    print("append-only store (every version ever seen):")
    final.select(*KEYS, "Test1", "Grade", "INSERT_RUN_ID").orderBy(
        "Lastname", "INSERT_RUN_ID"
    ).show(truncate=False)

    # --- full SCD2 with the partitioned store ----------------------------
    scd2 = etl.Scd2Store(spark, f"{workdir}/scd2")
    for run, ts in (("first_run", "2024-01-10 08:00:00"), ("second_run", "2024-01-11 08:00:00")):
        batch = spark.createDataFrame(
            GRADES if run == "first_run" else SECOND_LOAD, SCHEMA
        )
        currents = etl.create_currents(ts)
        scd2.merge(
            etl.add_meta_columns(batch, currents, KEYS),
            currents=currents,
            valid_from_mode=etl.VALID_FROM_MODE_LOAD_DATE
            if run != "first_run"
            else etl.VALID_FROM_MODE_LOWER_BOUND,
        )
    print("SCD2 store (validity intervals):")
    scd2.read().select(*KEYS, "Test1", "Grade", "VALID_FROM", "VALID_TO").orderBy(
        "Lastname", "VALID_FROM"
    ).show(truncate=False)

    etl.delete_store(spark, store)
    spark.stop()


if __name__ == "__main__":
    main()
