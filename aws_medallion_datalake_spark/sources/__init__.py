"""Table format (snapshots/manifests) + synthetic data sources."""
