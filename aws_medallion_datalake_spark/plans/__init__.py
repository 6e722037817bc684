"""Driver-side planners (pure Python over manifest DataFrames)."""
