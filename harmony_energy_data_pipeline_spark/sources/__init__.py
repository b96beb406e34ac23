from harmony_energy_data_pipeline_spark.sources import files, keyset  # noqa: F401
