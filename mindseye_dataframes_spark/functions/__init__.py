from mindseye_dataframes_spark.functions.exact import dsum, davg, dec  # noqa: F401
from mindseye_dataframes_spark.functions.hashing import (  # noqa: F401
    hmac_sha1_seed,
    name_uuid,
    seeded_unit_rms_tensor,
)
