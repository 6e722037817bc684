"""Table-maintenance operators: compact, cluster, merge, expire, run."""

from .analyze import analyze_table  # noqa: F401
from .checkpoint import RunCheckpoint  # noqa: F401
from .cluster import cluster, clustering_quality  # noqa: F401
from .compact import compact  # noqa: F401
from .delete import (  # noqa: F401
    apply_deletes,
    delete_where,
    equality_delete,
    rewrite_delete_files,
)
from .expire import expire_snapshots, remove_orphan_files  # noqa: F401
from .matview import create_matview, refresh_matview  # noqa: F401
from .merge import merge_into  # noqa: F401
from .metascan import fast_count, fast_min_max  # noqa: F401
from .overwrite import overwrite_partitions, replace_where  # noqa: F401
from .run import run_maintenance  # noqa: F401
from .update import update_where  # noqa: F401
