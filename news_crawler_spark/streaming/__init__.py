"""Structured Streaming surface: file-replay event streams, watermarked
window aggregation (the streaming form of T6 freshness), gap-based
sessionization via applyInPandasWithState, and the foreachBatch bridge
that runs crawl windows as stream micro-batches."""
