"""User-facing migration/maintenance tools."""
