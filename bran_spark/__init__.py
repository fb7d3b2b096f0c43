"""bran_spark — a from-scratch, PySpark-native knowledge-graph construction
engine with the query/data-processing capabilities of patverga/bran
(full-abstract biomedical relation extraction, NAACL 2018; arXiv:1802.10569).

This is NOT a port of the reference TensorFlow code: the pipeline is declared
with the DataFrame API so Catalyst/Tungsten pick physical strategies; Python
runs only inside Arrow-batched pandas UDFs (encoder/scorer/BPE).

Layout
------
- ``session``     SparkSession factory (Arrow, AQE, nested pruning on)
- ``fixtures``    deterministic CDR-shaped corpus generator (seed=42)
- ``sources``     table IO (manifest-parquet checkpoint layer), PubTator parser
- ``functions``   columnar text/vector functions (BPE, lang-id, quality, ...)
- ``operators``   relational operators (pair-gen, linking, pooling, dedup, ANN)
- ``model``       seeded NumPy transformer encoder + bi-affine scorer (UDF-side)
- ``plans``       the flagship KG-construction DAG with checkpoint/resume
- ``streaming``   incremental (Trigger.AvailableNow-style) triple construction
"""

__version__ = "0.1.0"
