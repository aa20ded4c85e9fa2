"""Scalar column functions: URL canonicalization, keyword relevance,
time-format chains, text statistics. All hot paths are either native
Spark SQL expressions (JVM, whole-stage codegen) or vectorized
Arrow/pandas UDFs — never per-row Python UDFs."""
