"""Host-side utilities (point-cloud IO, visualization dumps)."""
