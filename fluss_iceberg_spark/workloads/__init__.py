"""Named workloads: each module registers queries into fluss_iceberg_spark.registry."""
