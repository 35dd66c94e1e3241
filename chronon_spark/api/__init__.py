from chronon_spark.api.types import (  # noqa: F401
    Accuracy,
    Aggregation,
    AggregationPart,
    EntitySource,
    EventSource,
    GroupBy,
    Join,
    JoinPart,
    Operation,
    Query,
    TimeUnit,
    Window,
)
