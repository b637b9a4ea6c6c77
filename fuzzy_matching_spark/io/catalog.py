"""Table-format abstraction: Iceberg catalog in production, Parquet locally.

The north rule targets Iceberg tables; this sandbox has no Iceberg jars, so
the abstraction keeps one DataFrame code path and switches the physical
binding by configuration:

* ``CatalogIO(catalog="my_iceberg")`` -> ``spark.read.table`` /
  ``writeTo(...).createOrReplace()`` against ``catalog.namespace.name``
  (requires the Iceberg runtime jar + catalog conf on the cluster).
* ``CatalogIO(root="/data")`` -> partitioned Parquet under ``root/name``.

Stage checkpointing in :mod:`pipeline.dedup_job` composes with either.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["CatalogIO"]


class CatalogIO:
    def __init__(
        self,
        spark: SparkSession,
        root: str | None = None,
        catalog: str | None = None,
        namespace: str = "dedup",
    ):
        if (root is None) == (catalog is None):
            raise ValueError("exactly one of root (parquet) / catalog (iceberg) required")
        self.spark = spark
        self.root = root
        self.catalog = catalog
        self.namespace = namespace

    def _ident(self, name: str) -> str:
        return f"{self.catalog}.{self.namespace}.{name}"

    def read(self, name: str) -> DataFrame:
        if self.catalog:
            return self.spark.read.table(self._ident(name))
        return self.spark.read.parquet(f"{self.root}/{name}")

    def write(self, df: DataFrame, name: str, partition_by: list[str] | None = None) -> None:
        if self.catalog:
            writer = df.writeTo(self._ident(name))
            if partition_by:
                from pyspark.sql import functions as F

                writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
            writer.createOrReplace()
            return
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(f"{self.root}/{name}")

    def exists(self, name: str) -> bool:
        if self.catalog:
            return self.spark.catalog.tableExists(self._ident(name))
        try:
            self.spark.read.parquet(f"{self.root}/{name}").schema
            return True
        except Exception:
            return False
