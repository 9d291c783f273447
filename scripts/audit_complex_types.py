"""List registry entries whose output schema contains ARRAY/MAP/STRUCT columns.

The driver's canonicalizer does pandas sort_values over object cells;
list/dict cells raise TypeError: unhashable type. Every entry printed here
must stringify those columns on both engine sides.
"""
import sys

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from pyspark.sql.types import ArrayType, MapType, StructType

import __spark_entry__ as e

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("audit-types")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

SF = "/root/testdata/sf0.001"
bad = {}
for name, fn in sorted(e.queries().items()):
    try:
        df = fn(spark, SF)
        cols = [
            (f.name, f.dataType.simpleString())
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if cols:
            bad[name] = cols
    except Exception as ex:  # noqa: BLE001
        print(f"{name}: ERROR {type(ex).__name__}: {ex}", file=sys.stderr)
for name, cols in bad.items():
    print(name, cols)
print(f"\n{len(bad)} entries with complex-typed output columns")
