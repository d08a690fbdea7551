"""SparkSession factory with scale-appropriate defaults.

Local test/bench sessions run on ``local[N]`` (single JVM); the same
configuration is what we would submit with ``spark-submit --py-files``
on a multi-executor cluster — nothing here is local-mode-specific
except the master URL.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "searchengine_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    AQE is on so runtime stats re-plan skewed joins and coalesce small
    shuffle partitions; Arrow is on so pandas UDFs move columnar batches.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    nshuffle = shuffle_partitions or int(
        os.environ.get("SPARK_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
    )
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(nshuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # r6: AQE's coalescing floor is byte-based (default 1 MB), which
        # folds a small-but-compute-heavy shuffle (per-pair Jaccard
        # verify, interpreted HOF chains over kilobyte rows) into 1-2
        # tasks while the rest of the cluster idles. A 64 KB floor keeps
        # such stages parallel (measured: dedup_ngram_jaccard 3.4->1.8 s
        # warm at sf0.1/local[32]); at production shuffle sizes every
        # partition is far above either floor, so coalescing behaves
        # identically there (advisoryPartitionSizeInBytes governs).
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_AQE_MIN_PARTITION_SIZE", "64k"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # classic (non-ANSI) semantics: out-of-bounds element_at -> NULL,
        # lossy casts -> NULL; matches the null-tolerant oracle SQL twins
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.sql.parquet.compression.codec", "zstd")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
