"""PySpark-native knowledge-graph construction engine.

A from-scratch re-implementation of the query/data-processing
capabilities of the reference Discord->KG pipeline
(`artfhc/project-discord-knowledge-graph`), re-expressed as lazy
DataFrame stages: text extraction -> classification -> triple
extraction -> Q&A linking -> entity linking -> canonicalization ->
graph materialization, plus the training-data-pipeline operators
(dedup, similarity search, text analytics) a 100 TB corpus needs.

Design stance (SURVEY.md section 7): every stage is a pure
DataFrame -> DataFrame function with a declared schema; native
column expressions wherever the Python/Java regex dialects agree,
Arrow-batched pandas UDFs where byte-parity with Python `re`
semantics is required.
"""

__version__ = "0.1.0"
