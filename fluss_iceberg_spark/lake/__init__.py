"""Lake table layer: snapshot-log Parquet tables with Iceberg-like semantics.

The reference stores cold data as Iceberg tables (Parquet + REST catalog +
snapshot metadata — fluss-iceberg/trino/iceberg.properties:1-9,
docker-compose.yml:126-137). The Spark-Iceberg connector jar is not
available in this environment, so this package provides a self-contained
equivalent with the same observable contract: atomic snapshot commits,
append vs PK-upsert (MERGE) writes, snapshot metadata tables
(``t$snapshots``, README.md:274-275), time travel, and the hot∪cold
union-read boundary (README.md:296-316).
"""

from fluss_iceberg_spark.lake.table import LakeCatalog, LakeTable  # noqa: F401
