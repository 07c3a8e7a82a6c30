"""Physical-plan inspection utilities."""

from .inspect import (  # noqa: F401
    BOUNDED_DOMAIN_HINTS,
    assert_scalable,
    bounded_key_windows,
    executed_plan,
    has_node,
    pushed_filters,
    read_schema,
    window_partitions,
    window_partitions_from_text,
)
