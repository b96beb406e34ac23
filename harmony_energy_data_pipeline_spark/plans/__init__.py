from harmony_energy_data_pipeline_spark.plans import inspect  # noqa: F401
