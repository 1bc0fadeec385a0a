"""Scene file loaders."""
