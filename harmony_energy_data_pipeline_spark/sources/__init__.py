from harmony_energy_data_pipeline_spark.sources import keyset  # noqa: F401
