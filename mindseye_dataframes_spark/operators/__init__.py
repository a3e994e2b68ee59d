from mindseye_dataframes_spark.operators.zip_frames import zip_frames, with_row_index  # noqa: F401
