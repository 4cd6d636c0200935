"""Training drivers mirroring the reference CLI entry points."""
