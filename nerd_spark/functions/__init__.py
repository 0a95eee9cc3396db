"""Scalar/column function library (SURVEY §2.7).

All functions return Spark Column expressions built from
pyspark.sql.functions — JVM-side, codegen-friendly. No Python UDFs.
"""

from nerd_spark.functions.ip import (  # noqa: F401
    int2ipstr,
    ipstr2int,
    prefix24,
    subnet_range,
)
from nerd_spark.functions.mathx import (  # noqa: F401
    ewma_weights,
    nonlin,
    prob_or,
)
from nerd_spark.functions.text import (  # noqa: F401
    quality_features,
    token_count,
    word_shingles,
)
from nerd_spark.functions.timeutil import (  # noqa: F401
    age_days,
    date_str,
    parse_rfc_time,
)
