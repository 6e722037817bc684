"""Table-maintenance operators: compact, cluster, merge, expire, run."""

from .cluster import cluster  # noqa: F401
from .compact import compact  # noqa: F401
from .expire import expire_snapshots  # noqa: F401
from .merge import merge_into  # noqa: F401
