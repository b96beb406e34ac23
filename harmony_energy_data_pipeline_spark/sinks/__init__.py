from harmony_energy_data_pipeline_spark.sinks import upsert  # noqa: F401
