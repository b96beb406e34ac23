"""Expression-level operator builders.

Every operator is a ``DataFrame -> DataFrame`` builder composed from
``pyspark.sql.functions`` (JVM-side, whole-stage-codegen friendly).
Python UDFs appear only in the extension modules (similarity,
multimodal) where no native expression exists, and there only as
Arrow-batched pandas UDFs.
"""

from harmony_energy_data_pipeline_spark.operators import (  # noqa: F401
    analytics,
    cleaning,
    dedup,
    expectations,
    graph,
    joins,
    multimodal,
    sampling,
    similarity,
    temporal,
    text,
)
