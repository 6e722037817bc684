"""Medallion bronze→silver→gold stages over the image+caption table."""

from .medallion import (  # noqa: F401
    bronze_ingest,
    gold_build,
    gold_build_star,
    quality_profile,
    register_gold_views,
    silver_refine,
    silver_transform,
)
from .verify import scan_equality_report  # noqa: F401
from .wap import gated_append, image_audit_gate  # noqa: F401
