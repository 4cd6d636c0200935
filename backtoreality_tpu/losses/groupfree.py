"""GroupFree3D training criteria (populated with the GF stack)."""
