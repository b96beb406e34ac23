from harmony_energy_data_pipeline_spark.streaming import incremental  # noqa: F401
