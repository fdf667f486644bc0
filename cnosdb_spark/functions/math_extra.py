"""Math scalar fns the reference has but Spark lacks.

Reference: DataFusion's lcm (used by function/common/math_function/
lcm.slt). Vectorized pandas UDF; registered once per session by Engine.
"""

import math

import pandas as pd
from pyspark.sql import functions as F, types as T


@F.pandas_udf(T.LongType())
def lcm_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [
            None if x is None or y is None
            else 0 if int(x) == 0 or int(y) == 0
            else abs(int(x) * int(y)) // math.gcd(int(x), int(y))
            for x, y in zip(a, b)
        ],
        dtype="object",
    )


@F.pandas_udf(T.LongType())
def gcd_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """DataFusion gcd (math_function/gcd.slt): gcd(0,0)=0, sign-insensitive."""
    return pd.Series(
        [
            None if x is None or y is None else math.gcd(int(x), int(y))
            for x, y in zip(a, b)
        ],
        dtype="object",
    )


def register(spark) -> None:
    spark.udf.register("lcm", lcm_udf)
    spark.udf.register("gcd", gcd_udf)
