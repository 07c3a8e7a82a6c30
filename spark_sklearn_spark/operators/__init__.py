from .asof import asof_join  # noqa: F401
from .range_join import interval_join  # noqa: F401
from .gapply import gapply  # noqa: F401
from .salting import with_salt, salted_join  # noqa: F401
