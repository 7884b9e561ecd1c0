"""pvt-spark: PySpark-native Hilbert vector-tile build engine.

See README.md; SURVEY.md documents the reference analysis this
implementation re-creates (Spark-first, not a port).
"""

__version__ = "0.1.0"
