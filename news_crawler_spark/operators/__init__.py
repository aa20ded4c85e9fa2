"""Relational + custom operators: page parsing (mapInPandas), Bloom-shard
URL-seen prefilter, dedup family (exact / fuzzy / MinHash-LSH / SimHash /
embedding), politeness scheduler, span assembly, similarity search,
multimodal column plumbing."""
