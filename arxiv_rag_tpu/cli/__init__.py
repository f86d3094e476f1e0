"""`arag` CLI: one verb per pipeline stage (SURVEY §7 layer 6)."""
