from mindseye_dataframes_spark.sources.readers import (  # noqa: F401
    TABLES,
    load_table,
    register_views,
    read_csv,
    read_json,
    read_parquet,
)
from mindseye_dataframes_spark.sources.sinks import write_parquet  # noqa: F401
