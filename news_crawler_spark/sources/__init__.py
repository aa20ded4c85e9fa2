"""State storage: snapshot-versioned Parquet tables with atomic
multi-table commits (Iceberg-shaped — SURVEY §7.1 step 7), plus the
replayed fetch-corpus builders."""
