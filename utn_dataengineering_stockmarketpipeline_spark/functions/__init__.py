from .scalar import (  # noqa: F401
    date_parts,
    fmt_ddmmyyyy,
    surrogate_key,
)
from .hashing import (  # noqa: F401
    M31,
    base_hash31,
    md5_prefix64,
    perm_hash,
    perm_seeds,
    shingles,
    token_hash,
)
from .vectors import cosine_blas, cosine_similarity, dot, l2_norm  # noqa: F401
