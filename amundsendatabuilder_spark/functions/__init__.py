"""Column-function library. Everything here composes built-in
``pyspark.sql.functions`` (JVM-side, whole-stage-codegen'd). Python/Pandas
UDFs are quarantined in ``operators/multimodal.py`` where binary decode
genuinely requires them.
"""

from amundsendatabuilder_spark.functions.scalars import (  # noqa: F401
    epoch_from_string, literal_replace, normalize_tags, round_half_away,
    template_substitute, decode_presto_view,
)
from amundsendatabuilder_spark.functions.text import (  # noqa: F401
    tokens, word_shingles, char_ngrams, token_count_ws, token_count_bpe,
    punct_ratio, stopword_ratio, quality_score, fingerprint_md5,
)
from amundsendatabuilder_spark.functions.vectors import (  # noqa: F401
    dot, l2_norm, cosine_similarity,
)
from amundsendatabuilder_spark.functions.hashing import (  # noqa: F401
    md5_minhash, nibble_value,
)
