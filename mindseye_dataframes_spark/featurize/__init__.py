from mindseye_dataframes_spark.featurize.context import ModelContext  # noqa: F401
from mindseye_dataframes_spark.featurize.modeler import DataframeModeler  # noqa: F401
from mindseye_dataframes_spark.featurize.strategy import (  # noqa: F401
    CategorizingStrategy,
    HashedBucketStrategy,
    ModelingStrategy,
)
