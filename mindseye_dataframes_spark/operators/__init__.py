from mindseye_dataframes_spark.operators.bloom import (  # noqa: F401
    bloom_build,
    bloom_prefilter,
)
from mindseye_dataframes_spark.operators.compaction import (  # noqa: F401
    compact,
    compaction_plan,
    file_row_stats,
)
from mindseye_dataframes_spark.operators.expectations import (  # noqa: F401
    Check,
    check_in_range,
    check_in_set,
    check_min_rows,
    check_not_null,
    check_unique,
    run_checks,
)
from mindseye_dataframes_spark.operators.grouped import grouped_ols  # noqa: F401
from mindseye_dataframes_spark.operators.merge import merge_upsert  # noqa: F401
from mindseye_dataframes_spark.operators.pq import (  # noqa: F401
    pq_encode,
    pq_topk,
    pq_train,
)
from mindseye_dataframes_spark.operators.zip_frames import (  # noqa: F401
    with_row_index,
    zip_frames,
)
