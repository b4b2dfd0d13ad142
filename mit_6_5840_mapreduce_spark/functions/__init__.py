from mit_6_5840_mapreduce_spark.functions.text import (  # noqa: F401
    TOKEN_SPLIT_RE,
    tokenize,
    tokens_df,
)
from mit_6_5840_mapreduce_spark.functions.hashing import (  # noqa: F401
    md5_int32,
    md5_int60,
)
