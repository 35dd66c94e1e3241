from chronon_spark.catalog.format import (  # noqa: F401
    DeltaFormat,
    Format,
    HiveFormat,
    IcebergFormat,
    ParquetPathFormat,
    parse_hive_style_partition,
    resolve_format,
    write_partitioned,
)
