"""Sources: deterministic fixture synthesis + table loaders."""
