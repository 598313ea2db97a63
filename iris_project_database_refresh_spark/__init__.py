"""PySpark-native engine with the query/data-processing capabilities of
the IRIS database-refresh reference (alexwday/iris-project-database-refresh).

Everything here is built on public PySpark APIs only. The reference's
single-node Python pipeline stages are re-expressed as declarative
DataFrame plans so Catalyst/Tungsten/AQE pick the physical strategy;
Python appears only in clearly-marked multimodal stubs and stateful
streaming.
"""

__version__ = "0.1.0"
