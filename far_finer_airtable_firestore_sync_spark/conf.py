"""Cluster-sizing heuristics: turn (data size, cluster shape, workload)
into the Spark conf this engine is designed to run under.

Codifies SCALE.md's sizing rules as one reviewable function instead of
tribal knowledge. Targets, with sources in public Spark tuning
guidance:

- shuffle partitions sized so a post-shuffle partition lands near
  ``TARGET_SHUFFLE_PARTITION_BYTES`` (128 MiB) — small enough to fit
  executor memory with room for hash tables, big enough to amortize
  task overhead; never below total cores (idle executors) and never
  above ``MAX_SHUFFLE_PARTITIONS`` (driver/scheduler pressure). AQE
  coalescing trims the excess at runtime, so erring high is safe.
- scan partitions via ``files.maxPartitionBytes``: default 128 MiB;
  media/binary corpora drop to 32 MiB so an Arrow batch of payloads
  fits comfortably while decoding (operators/multimodal.py contract).
- AQE on, with skew-join splitting — the engine's skew story
  (operators/skew.py salting) is for KNOWN hot keys; AQE catches the
  unknown ones.
- broadcast threshold raised to 64 MiB: the engine leans hard on
  broadcast dims (strategies, IVF probes, bucket weights), and modern
  executor memory makes the 10 MiB default needlessly conservative.
- streaming state partitions come from key arrival rate, NOT batch
  shuffle width (streaming/sync.py:run_stream_to_memory rationale);
  exposed here so jobs size both from one place.
"""

from __future__ import annotations

TARGET_SHUFFLE_PARTITION_BYTES = 128 * 1024 * 1024
MEDIA_MAX_PARTITION_BYTES = 32 * 1024 * 1024
MAX_SHUFFLE_PARTITIONS = 20_000
BROADCAST_THRESHOLD_BYTES = 64 * 1024 * 1024


def recommended_conf(
    corpus_bytes: int,
    executors: int,
    cores_per_executor: int = 4,
    workload: str = "batch",
) -> dict[str, str]:
    """Spark conf dict for this engine at a given scale.

    ``corpus_bytes``: size of the largest table the job shuffles (not
    the whole lake). ``workload``: "batch" | "media" | "streaming".
    """
    if corpus_bytes <= 0:
        raise ValueError("corpus_bytes must be positive")
    if workload not in ("batch", "media", "streaming"):
        raise ValueError(f"unknown workload: {workload}")
    total_cores = max(1, executors * cores_per_executor)
    by_size = -(-corpus_bytes // TARGET_SHUFFLE_PARTITION_BYTES)  # ceil
    shuffle = min(MAX_SHUFFLE_PARTITIONS, max(total_cores, by_size))
    conf = {
        "spark.sql.shuffle.partitions": str(shuffle),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.autoBroadcastJoinThreshold": str(
            BROADCAST_THRESHOLD_BYTES
        ),
        "spark.sql.files.maxPartitionBytes": str(
            MEDIA_MAX_PARTITION_BYTES
            if workload == "media"
            else TARGET_SHUFFLE_PARTITION_BYTES
        ),
        "spark.sql.session.timeZone": "UTC",
    }
    if workload == "streaming":
        # state stores are per-partition per-operator: size to key
        # cardinality pressure, not batch width (a too-wide stream
        # pays store setup + checkpoint I/O on every micro-batch)
        conf["spark.sql.shuffle.partitions"] = str(
            min(shuffle, max(total_cores, 64))
        )
    return conf


def apply_conf(spark, conf: dict[str, str]) -> None:
    """Apply a conf dict to a live session (runtime-settable keys)."""
    for k, v in conf.items():
        spark.conf.set(k, v)
