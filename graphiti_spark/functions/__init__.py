from graphiti_spark.functions.normalize import (  # noqa: F401
    normalize_entity_name_col,
    normalize_entity_name_py,
    predicate_name_col,
    predicate_name_py,
)
from graphiti_spark.functions.ids import (  # noqa: F401
    entity_uuid_py,
    edge_uuid_py,
    episode_uuid_py,
    entity_uuid_udf,
    edge_uuid_udf,
    episode_uuid_udf,
)
from graphiti_spark.functions.hashing import (  # noqa: F401
    md5_long_col,
    minhash_cols,
    simhash_col,
)
from graphiti_spark.functions.embeddings import (  # noqa: F401
    hashed_ngram_embedding_py,
    hashed_ngram_embedding_udf,
    cosine_col,
    dot_col,
    l2_normalize_col,
)
