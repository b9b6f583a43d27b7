"""Physical-plan inspection helpers: assert the plan shape we designed for."""

from fluss_iceberg_spark.plans.checks import physical_plan  # noqa: F401
