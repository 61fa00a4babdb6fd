"""Structured Streaming ingestion into the encode pipeline.

The engine's durable layer is batch + manifest-resume (SURVEY.md §3.3);
this module adds the streaming front door for sources that arrive
continuously (file drops, Kafka): each micro-batch flows through the
same salted-partition + codec kernels via ``foreachBatch`` and commits
pages + manifest rows atomically per batch, so the result is readable
with :func:`cpp_parquet_spark.engine.decode_dataset` exactly like a
batch run — and exactly-once per micro-batch comes from pairing Spark's
streaming checkpoint with an attempt-unique manifest run_id carrying the
epoch as its prefix (replays are detected by prefix, crashed attempts
leave only orphan pages that committed readers never see).

At scale: each micro-batch is an independent bounded encode job (one
shuffle), so throughput tuning is identical to the batch path;
``maxFilesPerTrigger`` bounds batch size the way bytes-per-part planning
bounds parts.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from .engine import run_encode
from .partitioning import EncodeConfig


def stream_encode(spark: SparkSession, src_dir: str, schema, dst: str,
                  cfg: EncodeConfig, checkpoint: str | None = None,
                  max_files_per_trigger: int = 16, **trigger_kwargs):
    """Start a file-source stream that encodes every micro-batch.

    Returns the StreamingQuery (caller stops/awaits it). Pages land under
    ``dst/pages``, manifest rows under ``dst/manifest`` with
    ``run_id = batch-<epoch_id>-<attempt uuid>`` — the lineage that makes
    replays idempotent: a committed epoch is skipped (prefix match), and a
    crashed attempt's pages are orphans the manifest join drops
    (engine.read_committed_pages).
    """
    checkpoint = checkpoint or os.path.join(dst, "_checkpoint")

    reader = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", max_files_per_trigger)
              .parquet(src_dir))

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        ss = batch_df.sparkSession
        # run_id must be ATTEMPT-unique, not just epoch-unique: if a prior
        # attempt crashed after pages.write but before the manifest commit,
        # an epoch-keyed run_id would re-append pages under the same id and
        # the manifest join could not tell the two copies apart. With a
        # per-attempt uuid suffix the crashed attempt's pages stay orphans
        # (no manifest row ever names their run_id) and read_committed_pages
        # drops them; the replay guard matches on the epoch PREFIX.
        epoch_prefix = f"batch-{epoch_id}-"
        run_id = epoch_prefix + uuid.uuid4().hex[:8]
        manifest_dir = os.path.join(dst, "manifest")
        try:
            already = (ss.read.parquet(manifest_dir)
                       .filter(F.col("run_id").startswith(epoch_prefix))
                       .limit(1).count())
        except Exception:
            already = 0
        if already:            # checkpoint replay of a committed batch
            return
        run_encode(ss, batch_df, dst, cfg, run_id=run_id, resume=False)

    return (reader.writeStream
            .foreachBatch(sink)
            .option("checkpointLocation", checkpoint)
            .trigger(**(trigger_kwargs or {"availableNow": True}))
            .start())
