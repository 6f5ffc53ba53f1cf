from .quality import (  # noqa: F401
    nonempty_check,
    orphan_fk_check,
    predicate_absent_check,
    quality_suite,
    unique_key_check,
)
