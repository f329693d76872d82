"""SQL-callable function registration.

Catalyst-expression helpers (functions/text.py, functions/vector.py) need
no registration — they compose as Columns. This module registers the
genuinely Python-backed functions so ``spark.sql`` users can call them by
name, always in the Arrow-vectorized pandas form (a row-at-a-time Python
UDF on a 100 TB scan is the canonical anti-pattern)."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


def register_sql_functions(spark: SparkSession, prefix: str = "engine_") -> list[str]:
    """Register the engine's Python-backed SQL functions; returns names.

    - ``engine_shingles(text)``   → array<string> distinct word 3-grams
    - ``engine_jaccard(a, b)``    → double Jaccard of two string arrays
    - ``engine_feature_norm(b)``  → double norm of the fake byte extractor
    """
    from ..operators.dedup import _shingle_udf
    from ..operators.multimodal import _default_fake_decoder

    spark.udf.register(f"{prefix}shingles", _shingle_udf(3))

    @F.pandas_udf(DoubleType())
    def jaccard(a: pd.Series, b: pd.Series) -> pd.Series:
        def j(x, y):
            if x is None or y is None:
                return None
            sx, sy = set(x), set(y)
            if not sx and not sy:
                return 0.0
            return len(sx & sy) / len(sx | sy)
        return pd.Series([j(x, y) for x, y in zip(a, b)])

    spark.udf.register(f"{prefix}jaccard", jaccard)

    @F.pandas_udf(DoubleType())
    def feature_norm(payload: pd.Series) -> pd.Series:
        import math

        def n(p):
            if p is None:
                return None
            feats = _default_fake_decoder(bytes(p))
            return math.sqrt(sum(v * v for v in feats))
        return payload.map(n)

    spark.udf.register(f"{prefix}feature_norm", feature_norm)

    return [f"{prefix}shingles", f"{prefix}jaccard", f"{prefix}feature_norm"]
