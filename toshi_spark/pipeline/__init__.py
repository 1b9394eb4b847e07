"""Training-data pipeline operators over document/embedding tables.

These go beyond the reference's query surface: the operations a
100 TB training-data pipeline needs around a full-text index —
deduplication, similarity search, text quality analysis, multimodal
column plumbing.  All hot paths are JVM-side column algebra
(md5/array/higher-order functions); Python appears only in
Arrow-batched kernels.
"""
