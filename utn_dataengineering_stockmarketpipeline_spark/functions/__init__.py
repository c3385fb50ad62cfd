from .scalar import (  # noqa: F401
    date_parts,
    fmt_ddmmyyyy,
    surrogate_key,
)
from .hashing import (  # noqa: F401
    md5_prefix64,
    minhash_signature,
    salted_hash,
    shingles,
    simhash,
    token_hash,
)
from .vectors import cosine_similarity, dot, l2_norm  # noqa: F401
