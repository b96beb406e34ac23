from harmony_energy_data_pipeline_spark.functions import jsonx, textx, vector  # noqa: F401
