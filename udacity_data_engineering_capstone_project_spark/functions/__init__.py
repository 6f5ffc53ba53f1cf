from .dates import (  # noqa: F401
    date_attrs,
    date_to_sas,
    is_weekend_expr,
    sas_to_date,
    season_expr,
)
from .hashing import (  # noqa: F401
    sql_hex_to_long,
    sql_md5_long,
)
from .rounding import round_fixed, sql_round_fixed  # noqa: F401
from .textnorm import (  # noqa: F401
    sql_norm_text,
    sql_tokens,
    tokens_col,
)
from .vectors import cosine_cols, dot_col, norm_col, to_double_array  # noqa: F401
