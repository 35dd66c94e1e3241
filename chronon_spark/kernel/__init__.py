from chronon_spark.kernel.sawtooth import compute_asof_features  # noqa: F401
