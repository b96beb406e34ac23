from harmony_energy_data_pipeline_spark.pipeline import run  # noqa: F401
