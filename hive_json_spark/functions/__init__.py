from hive_json_spark.functions.classifiers import (  # noqa: F401
    HEX_REGEX,
    TIMESTAMP_REGEX,
    DECIMAL_REGEX,
    is_hex_binary,
    is_timestamp_like,
    is_decimal_like,
    classify_string,
)
from hive_json_spark.functions.text import (  # noqa: F401
    token_count,
    char_count,
    distinct_token_count,
    stopword_ratio,
    quality_score,
    bpe_ish_token_count,
    word_shingles,
)
from hive_json_spark.functions.vectors import (  # noqa: F401
    cosine_similarity,
    dot_product,
    l2_norm,
)
