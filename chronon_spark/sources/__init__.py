from chronon_spark.sources.scan import load_table, scan_source  # noqa: F401
from chronon_spark.sources.webtext import generate_webtext  # noqa: F401
