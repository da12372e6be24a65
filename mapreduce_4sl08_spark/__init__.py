"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference MapReduce engine (Collin911/MapReduce_4SL08),
re-expressed Spark-first, plus the relational / streaming / LLM-data-pipeline
surface described in SURVEY.md.

Layout:
    session     SparkSession factory with scale-aware defaults
    sources     readers/sinks for the test star schema + generic formats
    functions   curated scalar-function facade (text normalization, vectors)
    operators   wordcount (reference parity), dedup, similarity, text stats,
                multimodal plumbing, as-of/range joins
    plans       the named query registry driving __spark_entry__ + bench
    streaming   structured-streaming builders (windows, watermarks, dedup)
"""

__version__ = "0.1.0"
