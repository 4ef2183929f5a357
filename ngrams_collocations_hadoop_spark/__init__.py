"""ngrams_collocations_hadoop_spark — a PySpark-native analytics engine.

A from-scratch, DataFrame-first engine with the query and data-processing
capabilities of the reference Hadoop-MapReduce collocation-extraction
pipeline (Gal-Schwartz/ngrams-collocations-hadoop), re-expressed as
composable Spark operators, plus the large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal plumbing)
the reference's fixed three-job design cannot express.

Design stance (SURVEY.md §7.0): every operator is a function
``DataFrame -> DataFrame`` with an explicit schema contract; Catalyst does
all optimization; no custom execution layer.
"""

__version__ = "0.1.0"
