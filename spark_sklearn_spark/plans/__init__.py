"""Physical-plan inspection utilities."""

from .inspect import (  # noqa: F401
    executed_plan,
    has_node,
    pushed_filters,
    read_schema,
    assert_scalable,
)
