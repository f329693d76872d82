"""Engine function library: reusable column expressions + SQL registration.

The reference exposes no user-extensible functions (SURVEY.md §2.2 "UDF
surface: none") — its rule tables are data-driven. This package is the
Spark-native equivalent surface: every reusable expression the operators
use (vector math, text statistics, hashing) as composable Column builders,
plus ``register_sql_functions`` so ``spark.sql`` users can call the
Python-backed ones by name.
"""

from .register import register_sql_functions  # noqa: F401
from .text import (  # noqa: F401
    bpe_token_estimate,
    punct_ratio,
    rolling_fingerprint,
    token_count,
    type_token_ratio,
)
from .vector import cosine_expr, dot_expr, norm_expr  # noqa: F401
