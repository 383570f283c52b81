"""Structured-Streaming layer: dynamic tables over micro-batch streams.

Mirrors the reference's streaming SQL surface (SURVEY.md sections 2.9,
3.3) on Spark Structured Streaming: file/rate sources -> watermarked
event-time transformations -> sinks. Spark's micro-batch engine IS the
reference's MiniBatch execution mode (StreamExecMiniBatchAssigner et
al.), and its checkpointed state stores replace Flink's RocksDB keyed
state + checkpoint coordinator — nothing to rebuild there.

Helpers here give the driver-facing queries a deterministic
replay-to-table harness (stream-table duality: replaying a bounded log
through the streaming engine must converge to the batch answer —
SURVEY.md section 5 test strategy).
"""

from flink_release_1_16_0_spark.streaming.core import replay_stream, run_to_table

__all__ = ["replay_stream", "run_to_table"]
